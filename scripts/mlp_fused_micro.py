"""Focused micro: fused MLP Pallas kernel (ops/fused_mlp.py) vs the XLA MLP
at the ViT-H b128 shape. Run via the healthy-window runner or standalone;
all device reads go through utils.device.fetch (retry + wedge tally).

Usage: python -u scripts/mlp_fused_micro.py
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp

from hippomm_tpu.utils.device import fetch, warm_transport
from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual, fused_mlp

B, T, D, LAYERS = 128, 257, 1280, 32

print("transport:", warm_transport(), flush=True)
key = jax.random.PRNGKey(0)
x = jax.device_put(jax.random.normal(key, (B, T, D), jnp.bfloat16))
w1 = jax.device_put(0.02 * jax.random.normal(key, (4 * D, D), jnp.float32))
b1 = jax.device_put(jnp.zeros((4 * D,), jnp.float32))
w2 = jax.device_put(0.02 * jax.random.normal(key, (D, 4 * D), jnp.float32))
b2 = jax.device_put(jnp.zeros((D,), jnp.float32))
gamma = jax.device_put(1.0 + 0.1 * jax.random.normal(key, (D,), jnp.float32))
beta = jax.device_put(0.1 * jax.random.normal(key, (D,), jnp.float32))


def chain(fn, n=LAYERS):
    @jax.jit
    def run(x0):
        def body(h, _):
            return fn(h), None

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(out[..., :1, :1].astype(jnp.float32))

    return run


def bench(name, run, x0, reps=8):
    try:
        fetch(run(x0))  # compile + warm
        t0 = time.perf_counter()
        outs = [run(x0) for _ in range(reps)]
        fetch(outs[-1])
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(outs[0])
        floor = time.perf_counter() - t0
        dt = max(total - floor, 0.0) / reps * 1000
        print(f"{name:42s} {dt:8.2f} ms /32L (floor {floor*1000:.0f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — one row (e.g. a Mosaic VMEM
        # failure on a staged kernel) must not kill the remaining rows
        print(f"{name:42s} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
        return float("nan")


def mlp_bf16_gelu(h):
    y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    y = (y + b1).astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
    return z.astype(jnp.bfloat16)


def mlp_fused(h):
    return fused_mlp(h.reshape(B * T, D), w1, b1, w2, b2).reshape(B, T, D)


def main():
    # correctness on hardware first (scalar reductions: tiny reads).
    # Reference = the kernel's OWN op order ("as" gelu body, fp32 A&S erf):
    # comparing against exact-gelu XLA here read 4.99e-01 in r4 and was
    # misdiagnosed as wedge garbage — scripts/fused_verdict.py showed it was
    # the two XLA references differing by accumulated ±1-ulp bf16 noise over
    # the 5120-dim contraction, amplified by max-rel on near-zero outputs
    # (abs err ≤1.6e-2 on ~0.4-scale outputs). The kernel-vs-own-op-order
    # check reads 5.7e-3 on hardware; tolerance 3e-2 covers it with margin.
    from hippomm_tpu.ops.fused_mlp import _erf_as

    hh = jax.random.normal(jax.random.PRNGKey(4), (256, D), jnp.float32).astype(jnp.bfloat16)
    got = fused_mlp(hh, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
                    False, "as")

    def mlp_as_ref(h):
        y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        y = (y + b1).astype(jnp.bfloat16)
        y = 0.5 * y.astype(jnp.float32) * (
            1.0 + _erf_as(y.astype(jnp.float32) * 0.7071067811865476)
        )
        y = y.astype(jnp.bfloat16)
        z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
        return z.astype(jnp.bfloat16)

    want = mlp_as_ref(hh)
    g32 = got.astype(jnp.float32)
    w32 = want.astype(jnp.float32)
    rel = float(fetch(jnp.max(jnp.abs(g32 - w32) / (jnp.abs(w32) + 1e-2)), give_up_s=240.0))
    print(f"on-device rel err vs own op order: {rel:.2e}", flush=True)
    if rel >= 3e-2:
        print(f"WARNING: rel err {rel:.2e} out of tolerance — window suspect", flush=True)

    def mlp_fused_poly(h):
        return fused_mlp(h.reshape(B * T, D), w1, b1, w2, b2, False, "poly").reshape(B, T, D)

    # half-block rows: the real per-layer stream is x + mlp(ln2(x)) — measure
    # the whole half-block both ways so the LN write+read and residual
    # traffic the fused kernel removes are IN the baseline
    def ln_bf16(h):
        hf = h.astype(jnp.float32)
        mu = jnp.mean(hf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
        y = (hf - mu) * jax.lax.rsqrt(var + 1e-6)
        return (y * gamma + beta).astype(jnp.bfloat16)

    def halfblock_xla(h):
        return h + mlp_bf16_gelu(ln_bf16(h))

    def halfblock_fused(h):
        return fused_ln_mlp_residual(
            h.reshape(B * T, D), gamma, beta, w1, b1, w2, b2
        ).reshape(B, T, D)

    def halfblock_fused_384(h):
        # fallback schedule if bn=512 + LN scratch overruns VMEM
        return fused_ln_mlp_residual(
            h.reshape(B * T, D), gamma, beta, w1, b1, w2, b2, bn=384
        ).reshape(B, T, D)

    # on-device correctness for the half-block kernel (scalar read; same
    # own-op-order reference policy as the MLP check above)
    try:
        hb_got = fused_ln_mlp_residual(hh, gamma, beta, w1.astype(jnp.bfloat16), b1,
                                       w2.astype(jnp.bfloat16), b2,
                                       gelu_impl="as")
        hb_want = hh + mlp_as_ref(ln_bf16(hh.reshape(1, 256, D)).reshape(256, D))
        hb_rel = float(fetch(jnp.max(
            jnp.abs(hb_got.astype(jnp.float32) - hb_want.astype(jnp.float32))
            / (jnp.abs(hb_want.astype(jnp.float32)) + 1e-2)), give_up_s=240.0))
        print(f"halfblock on-device rel err: {hb_rel:.2e}", flush=True)
        if hb_rel >= 3e-2:
            print(f"WARNING: halfblock rel err {hb_rel:.2e} out of tolerance — window suspect", flush=True)
    except Exception as e:  # noqa: BLE001 — keep the timing rows alive
        print(f"halfblock correctness check FAILED: {type(e).__name__}: {e}"[:300], flush=True)

    rows = {}
    rows["mlp_xla"] = bench("4c. MLP XLA (fp32 accum, bf16 gelu)", chain(mlp_bf16_gelu), x)
    rows["mlp_fused"] = bench("8.  MLP fused pallas (A&S gelu)", chain(mlp_fused), x)
    rows["mlp_fused_poly"] = bench("8b. MLP fused pallas (poly gelu)", chain(mlp_fused_poly), x)
    rows["halfblock_xla"] = bench("9.  LN+MLP+resid XLA", chain(halfblock_xla), x)
    rows["halfblock_fused"] = bench("9b. LN+MLP+resid fused pallas", chain(halfblock_fused), x)
    rows["halfblock_fused_384"] = bench("9c. LN+MLP+resid fused bn=384", chain(halfblock_fused_384), x)
    rows["mlp_fused_rep"] = bench("8.  MLP fused pallas (rep)", chain(mlp_fused), x)
    rows["mlp_xla_rep"] = bench("4c. MLP XLA (rep)", chain(mlp_bf16_gelu), x)
    import json

    print(json.dumps({k: round(v, 2) for k, v in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
