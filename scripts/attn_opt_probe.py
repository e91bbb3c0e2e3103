"""Compile+run+parity probe for the PRODUCT flash kernel with softmax_opt.

attn_dbg measures its OWN kernel copies; this probes ops/flash_attention.py's
real _mha_kernel with the softmax_opt composition that is now backend-gated
auto-on (CLS-split + deferred division) — at the two shapes bench exercises:
the ViT tower (Tk=257, CLS-splittable) and a non-splittable Tk (deferred-
division legacy body). A Mosaic compile failure here means flip
HIPPOMM_FLASH_SOFTMAX_OPT default back off BEFORE the next bench.

Run via healthy_window_runner (fresh subprocess; scalar fetches only).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.utils.device import fetch, warm_transport
from hippomm_tpu.ops.flash_attention import flash_mha

print("transport:", warm_transport(), flush=True)

ok = True
for label, (b, h, t, hd) in (
    ("vit_b128 Tk=257 (cls-split)", (128, 16, 257, 80)),
    ("vit_b32 Tk=257 (cls-split)", (32, 16, 257, 80)),
    ("nonsplit Tk=232 (defer-div)", (8, 8, 232, 64)),
):
    try:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.device_put(jax.random.normal(kq, (b, h, t, hd), jnp.bfloat16))
        k = jax.device_put(jax.random.normal(kk, (b, h, t, hd), jnp.bfloat16))
        v = jax.device_put(jax.random.normal(kv, (b, h, t, hd), jnp.bfloat16))
        scale = float(1.0 / np.sqrt(hd))
        t0 = time.perf_counter()
        o_opt = flash_mha(q, k, v, scale, False, True)
        o_leg = flash_mha(q, k, v, scale, False, False)
        # on-device parity: the opt body must match the legacy body to ~1 bf16
        # ulp (PARITY.md row); one scalar fetch
        d = float(fetch(
            jnp.max(jnp.abs(o_opt.astype(jnp.float32) - o_leg.astype(jnp.float32))),
            give_up_s=240.0,
        ))
        wall = time.perf_counter() - t0
        print(f"{label}: max|opt-legacy|={d:.3e} compile+run {wall:.1f}s", flush=True)
        if not (d < 2e-2):  # bf16 ulp scale at O(1) outputs; NaN fails too
            ok = False
            print(f"FAIL: {label} parity out of tolerance", flush=True)
    except Exception as e:  # noqa: BLE001 — report every shape before exiting
        ok = False
        print(f"FAIL: {label}: {type(e).__name__}: {e}"[:400], flush=True)

print("attn_opt_probe:", "PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
