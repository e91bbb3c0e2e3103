"""Dissect the flash-attention kernel's softmax VPU wall (ViT-H b128 shape).

The product kernel (ops/flash_attention.py:_mha_kernel) measures ~82 ms per
32-layer chain against an ~11 ms matmul speed-of-light — the residual is the
softmax's VPU work over the (272, 384) logit block per (batch·head) unit.
Variants isolate each component so the optimization (CLS-split lanes, fast
exp, deferred division) targets the real cost:

  a. product kernel body (max → exp → sum → div), padded-key mask
  b. deferred div: value-matmul on e, scale rows by 1/sum after (smaller area)
  c. fast exp: exp(x) = 2^n · 2^r via int bitcast + degree-4 poly (x ≤ 0)
  d. no exp (placebo, wrong math): bounds the non-exp passes
  e. no mask (mask cost via a-e delta)

Run via healthy_window_runner; read-synced chain timing like vit_op_micro.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hippomm_tpu.utils.device import fetch, warm_transport

B, H, T, HD, LAYERS = 128, 16, 257, 80, 32
G, GB = B * H, 8
TQP, TKP, HDP = 272, 384, 128
SCALE = float(1.0 / np.sqrt(HD))
_NEG = -3.0e38

print("transport:", warm_transport(), flush=True)

_LOG2E = 1.4426950408889634
# 2^r on r ∈ [0, 1), degree-4 minimax (|rel err| < 1e-7 is overkill for bf16
# weights; these are the classic Cephes-style coefficients)
_C = (1.0, 0.6931471805599453, 0.2402265069591007, 0.05550410866482158,
      0.009618129107628477, 0.0013333558146428443, 0.0001540353039338161)


def _fast_exp(x):
    """exp for x ≤ 0 (post max-subtraction): 2^n · 2^r, n int via bitcast."""
    z = x * _LOG2E
    z = jnp.maximum(z, -126.0)
    n = jnp.floor(z)
    r = z - n  # [0, 1)
    p = _C[0] + r * (
        _C[1] + r * (_C[2] + r * (_C[3] + r * (_C[4] + r * (_C[5] + r * _C[6]))))
    )
    pow2n = jax.lax.bitcast_convert_type(
        ((n.astype(jnp.int32) + 127) << 23), jnp.float32
    )
    return p * pow2n


def make_kernel(variant: str):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        for u in range(q_ref.shape[0]):
            q = q_ref[u]
            k = k_ref[u]
            if variant.startswith("f_cls") or variant.startswith("g_cls"):
                # CLS-split: caller reorders keys so the single odd key (the
                # CLS token) is row 256; rows 0..255 are the 256 patch keys —
                # every softmax pass runs on an exactly-2-vreg 256-lane block
                # instead of the 384-lane padded block, and the padded-key
                # mask disappears. The CLS column is a rank-1 escape.
                km = k[0:256, :]
                lm = jax.lax.dot_general(
                    q, km, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * SCALE  # (TQ, 256)
                # CLS row via broadcast-mul-reduce: N=1 matmuls and 2-D
                # broadcasts trip Mosaic's vector.broadcast verifier
                kc = jnp.broadcast_to(k[256:257, :], (TQP, HDP)).astype(jnp.float32)
                lc = jnp.sum(q.astype(jnp.float32) * kc, axis=-1, keepdims=True) * SCALE
                m = jnp.maximum(jnp.max(lm, axis=-1, keepdims=True), lc)
                ex = _fast_exp if variant.startswith("f_cls") else jnp.exp
                em = ex(lm - m)  # (TQ, 256)
                ec = ex(lc - m)  # (TQ, 1)
                s = jnp.sum(em, axis=-1, keepdims=True) + ec
                o = jnp.dot(
                    em.astype(q.dtype), v_ref[u, 0:256, :],
                    preferred_element_type=jnp.float32,
                )
                vc = jnp.broadcast_to(v_ref[u, 256:257, :], (TQP, HDP)).astype(jnp.float32)
                o = o + jnp.broadcast_to(ec, (TQP, HDP)) * vc
                o_ref[u] = (o * (1.0 / s)).astype(o_ref.dtype)
                continue
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * SCALE
            if variant != "e_nomask":
                col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(col < T, logits, _NEG)
            m = jnp.max(logits, axis=-1, keepdims=True)
            if variant == "d_noexp":
                e = logits - m  # wrong math; placebo for exp cost
            elif variant == "c_fastexp":
                e = _fast_exp(logits - m)
            else:
                e = jnp.exp(logits - m)
            if variant == "b_defer_div":
                o = jnp.dot(e.astype(q.dtype), v_ref[u], preferred_element_type=jnp.float32)
                o = o * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                o_ref[u] = o.astype(o_ref.dtype)
            else:
                w = e / jnp.sum(e, axis=-1, keepdims=True)
                o_ref[u] = jnp.dot(
                    w.astype(q.dtype), v_ref[u], preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

    @jax.jit
    def run(qf, kf, vf):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, TQP, HDP), qf.dtype),
            grid=(G // GB, 1),
            in_specs=[
                pl.BlockSpec((GB, TQP, HDP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GB, TKP, HDP), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GB, TKP, HDP), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (GB, TQP, HDP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * G * TQP * TKP * HDP,
                bytes_accessed=4 * G * TQP * HDP * 2,
                transcendentals=G * TQP * TKP,
            ),
        )(qf, kf, vf)

    return run


def chain(fn, n=LAYERS):
    @jax.jit
    def run(q0, k0, v0):
        def body(c, _):
            return fn(c, k0, v0), None

        out, _ = jax.lax.scan(body, q0, None, length=n)
        return jnp.sum(out[..., :1, :1].astype(jnp.float32))

    return run


def bench(name, run, args, reps=8):
    try:
        fetch(run(*args))
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(reps)]
        fetch(outs[-1])
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(outs[0])
        floor = time.perf_counter() - t0
    except Exception as e:  # wedged mid-row: keep the rest of the battery
        print(f"{name:34s} WEDGED ({e})", flush=True)
        return float("nan")
    dt = max(total - floor, 0.0) / reps * 1000
    print(f"{name:34s} {dt:8.2f} ms /32L (floor {floor*1000:.0f} ms)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    qf = jax.device_put(jax.random.normal(key, (G, TQP, HDP), jnp.bfloat16))
    kf = jax.device_put(jax.random.normal(key, (G, TKP, HDP), jnp.bfloat16))
    vf = jax.device_put(jax.random.normal(key, (G, TKP, HDP), jnp.bfloat16))

    # correctness vs the product body (all on the same folded inputs; the
    # CLS-split variants read keys 0..256 — identical key set, mask-free)
    base = make_kernel("a_product")
    ga = base(qf, kf, vf).astype(jnp.float32)
    for v in ("b_defer_div", "c_fastexp", "f_cls_fast", "g_cls_exact"):
        gv = make_kernel(v)(qf, kf, vf).astype(jnp.float32)
        try:
            r = float(fetch(jnp.max(jnp.abs(ga - gv)), give_up_s=240.0))
        except Exception as e:
            r = float("nan")
            print(f"   (fetch wedged: {e})", flush=True)
        print(f"{v} vs product max abs (bf16 out): {r:.2e}", flush=True)

    rows = {}
    for v in ("a_product", "b_defer_div", "c_fastexp", "d_noexp", "e_nomask",
              "f_cls_fast", "g_cls_exact"):
        rows[v] = bench(v, chain(make_kernel(v)), (qf, kf, vf))
    import json

    print(json.dumps({k: round(x, 2) for k, x in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
