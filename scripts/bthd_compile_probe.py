"""Probe which (B, T, H, hd)-layout attention kernel variants COMPILE on the
remote Mosaic helper at the full ViT-H shape.

The product flash_mha_bthd compiled and matched exactly at (2, 37, 8, 80) on
hardware, but the full ViT-H chain shape (128, 257, 16, 80) returned HTTP 500
from the tpu_compile_helper (subprocess exit 1) — same failure class as the
gh=16 attempt in r4 session 1. Each variant here is lower()+compile() only
(no execution), so a wedged data path doesn't block iteration; run what
compiles through vit_op_micro afterwards for timing.

Usage: python scripts/bthd_compile_probe.py
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

B, T, H, HD = 128, 257, 16, 80
SCALE = float(1.0 / np.sqrt(HD))


def kernel_loop(q_ref, k_ref, v_ref, o_ref, *, scale):
    for u in range(q_ref.shape[2]):
        q = q_ref[0, :, u, :]
        k = k_ref[0, :, u, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, u, :] = jnp.dot(
            w.astype(q.dtype), v_ref[0, :, u, :], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def build(b, t, h, hd, gh, dtype=jnp.bfloat16, tq_blk=None):
    """pallas_call at the given blocking; returns a jitted fn of (q, k, v)."""
    tq_blk = tq_blk or t
    grid = (b, h // gh) if tq_blk == t else (b, h // gh, pl.cdiv(t, tq_blk))

    if tq_blk == t:
        q_spec = pl.BlockSpec((1, t, gh, hd), lambda i, j: (i, 0, j, 0),
                              memory_space=pltpu.VMEM)
        o_spec = q_spec
        kv_spec = pl.BlockSpec((1, t, gh, hd), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((1, tq_blk, gh, hd), lambda i, j, q: (i, q, j, 0),
                              memory_space=pltpu.VMEM)
        o_spec = q_spec
        kv_spec = pl.BlockSpec((1, t, gh, hd), lambda i, j, q: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)

    def fn(q, k, v):
        return pl.pallas_call(
            functools.partial(kernel_loop, scale=SCALE),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
        )(q, k, v)

    return jax.jit(fn)


VARIANTS = [
    # (label, b, t, h, hd, gh, tq_blk)
    ("full shape as product (gh=8)",       B, T, H, HD, 8, None),
    ("small batch b=8 (gh=8)",             8, T, H, HD, 8, None),
    ("tq padded to 264 (gh=8)",            B, 264, H, HD, 8, None),
    ("tq padded to 384 (gh=8)",            B, 384, H, HD, 8, None),
    ("tq-blocked 128 rows (gh=8)",         B, 384, H, HD, 8, 128),
    ("gh=16 == H",                         B, T, H, HD, 16, None),
    ("hd pre-padded to 128 (gh=8)",        B, T, H, 128, 8, None),
    ("mid tq=129 (gh=8)",                  B, 129, H, HD, 8, None),
    ("mid tq=65 (gh=8)",                   B, 65, H, HD, 8, None),
    ("known-good tiny (2,37,8,80) gh=8",   2, 37, 8, 80, 8, None),
]


def main():
    results = {}
    for label, b, t, h, hd, gh, tq_blk in VARIANTS:
        q = jax.ShapeDtypeStruct((b, t, h, hd), jnp.bfloat16)
        fn = build(b, t, h, hd, gh, tq_blk=tq_blk)
        t0 = time.perf_counter()
        try:
            fn.lower(q, q, q).compile()
            dt = time.perf_counter() - t0
            results[label] = f"OK ({dt:.1f}s)"
        except Exception as e:
            dt = time.perf_counter() - t0
            results[label] = f"FAIL ({dt:.1f}s): {str(e)[:160]}"
        print(f"{label:38s} {results[label]}", flush=True)
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
