"""Pre-compile every measurement kernel into the persistent JAX compilation
cache (.jax_cache). The remote compile helper works even when the DATA plane
is wedged, so running this during a sick window makes the next healthy
window spend its seconds on timing, not compilation.

Usage: python -u scripts/warm_compile.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

B, T, D, H, LAYERS = 128, 257, 1280, 16, 32
HD = D // H


def compile_one(label, fn, *avals):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*avals).compile()
        print(f"{label:44s} OK ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{label:44s} FAIL ({time.perf_counter() - t0:.1f}s): {str(e)[:160]}", flush=True)


def chain(fn, n=LAYERS):
    def run(x0):
        def body(h, _):
            return fn(h), None

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(out[..., :1, :1].astype(jnp.float32))

    return run


def main():
    xa = jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16)

    # ---- fused MLP (both gelu impls, chain + single) ----
    from hippomm_tpu.ops.fused_mlp import fused_mlp

    aw1 = jax.ShapeDtypeStruct((4 * D, D), jnp.float32)
    ab1 = jax.ShapeDtypeStruct((4 * D,), jnp.float32)
    aw2 = jax.ShapeDtypeStruct((D, 4 * D), jnp.float32)
    ab2 = jax.ShapeDtypeStruct((D,), jnp.float32)

    def chainw(fn):
        def run(x0, w1, b1, w2, b2):
            def body(h, _):
                return fn(h, w1, b1, w2, b2), None

            out, _ = jax.lax.scan(body, x0, None, length=LAYERS)
            return jnp.sum(out[..., :1, :1].astype(jnp.float32))

        return run

    def mlp_fused(h, w1, b1, w2, b2):
        return fused_mlp(h.reshape(B * T, D), w1, b1, w2, b2).reshape(B, T, D)

    def mlp_fused_poly(h, w1, b1, w2, b2):
        return fused_mlp(h.reshape(B * T, D), w1, b1, w2, b2, False, "poly").reshape(B, T, D)

    compile_one("fused_mlp chain (A&S)", chainw(mlp_fused), xa, aw1, ab1, aw2, ab2)
    compile_one("fused_mlp chain (poly)", chainw(mlp_fused_poly), xa, aw1, ab1, aw2, ab2)

    # ---- half-block kernel: LN prologue + MLP + residual epilogue ----
    from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual

    ag = jax.ShapeDtypeStruct((D,), jnp.float32)

    def chainw_hb(fn):
        def run(x0, g, b, w1, b1, w2, b2):
            def body(h, _):
                return fn(h, g, b, w1, b1, w2, b2), None

            out, _ = jax.lax.scan(body, x0, None, length=LAYERS)
            return jnp.sum(out[..., :1, :1].astype(jnp.float32))

        return run

    def halfblock(h, g, b, w1, b1, w2, b2):
        return fused_ln_mlp_residual(
            h.reshape(B * T, D), g, b, w1, b1, w2, b2
        ).reshape(B, T, D)

    compile_one("halfblock chain (ln+mlp+resid)", chainw_hb(halfblock),
                xa, ag, ag, aw1, ab1, aw2, ab2)

    def mlp_bf16_gelu(h, w1, b1, w2, b2):
        y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        y = (y + b1).astype(jnp.bfloat16)
        y = jax.nn.gelu(y, approximate=False)
        z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
        return z.astype(jnp.bfloat16)

    compile_one("mlp XLA 4c chain", chainw(mlp_bf16_gelu), xa, aw1, ab1, aw2, ab2)

    # ---- flash attention product kernel: legacy + softmax_opt chains ----
    from hippomm_tpu.ops.flash_attention import flash_mha

    aqkv_w = jax.ShapeDtypeStruct((3 * D, D), jnp.float32)
    aqkv_b = jax.ShapeDtypeStruct((3 * D,), jnp.float32)
    SCALE = float(1.0 / np.sqrt(HD))

    def split(t):
        return t.reshape(B, T, H, HD).transpose(0, 2, 1, 3)

    def attn_chain(opt):
        def run(x0, w_qkv, b_qkv):
            def body(h, _):
                qkv = jnp.dot(h, w_qkv.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
                qkv = qkv + b_qkv
                q, k, v = (qkv[..., :D].astype(jnp.bfloat16),
                           qkv[..., D:2 * D].astype(jnp.bfloat16),
                           qkv[..., 2 * D:].astype(jnp.bfloat16))
                o = flash_mha(split(q), split(k), split(v), SCALE, False, opt)
                return o.transpose(0, 2, 1, 3).reshape(B, T, D).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(body, x0, None, length=LAYERS)
            return jnp.sum(out[..., :1, :1].astype(jnp.float32))

        return run

    compile_one("attn chain legacy", attn_chain(False), xa, aqkv_w, aqkv_b)
    compile_one("attn chain softmax_opt", attn_chain(True), xa, aqkv_w, aqkv_b)

    # single-call kernels at tower shapes (vision b32 encode, whisper enc)
    q257 = jax.ShapeDtypeStruct((32, 16, 257, 80), jnp.bfloat16)
    compile_one("flash_mha b32 opt", lambda q, k, v: flash_mha(q, k, v, SCALE, False, True),
                q257, q257, q257)
    qw = jax.ShapeDtypeStruct((2, 20, 1500, 64), jnp.bfloat16)
    compile_one("flash_mha whisper-enc opt",
                lambda q, k, v: flash_mha(q, k, v, float(1 / np.sqrt(64)), False, True),
                qw, qw, qw)

    # ---- attn_dbg variants ----
    import scripts.attn_dbg as A

    for v in ("a_product", "b_defer_div", "c_fastexp", "d_noexp", "e_nomask",
              "f_cls_fast", "g_cls_exact"):
        qf = jax.ShapeDtypeStruct((A.G, A.TQP, A.HDP), jnp.bfloat16)
        kf = jax.ShapeDtypeStruct((A.G, A.TKP, A.HDP), jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            A.chain(A.make_kernel(v)).lower(qf, kf, kf).compile()
            print(f"attn_dbg {v:34s} OK ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"attn_dbg {v:34s} FAIL: {str(e)[:160]}", flush=True)

    # fused MLP vision b32 shape (ingest encode bucket)
    def mlp_fused_b32(h, w1, b1, w2, b2):
        return fused_mlp(h.reshape(32 * T, D), w1, b1, w2, b2).reshape(32, T, D)

    compile_one("fused_mlp b32", mlp_fused_b32,
                jax.ShapeDtypeStruct((32, T, D), jnp.bfloat16), aw1, ab1, aw2, ab2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
