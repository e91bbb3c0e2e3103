"""Decide the fused-MLP correctness question on hardware, with BOTH
reference formulations.

mlp_fused_micro read rel err 4.99e-01 at (256, 1280, 5120) in TWO separate
windows (one with sane timings) — deterministic, so not transport garbage.
fused_dbg's row 7 covers the same shape but references the A&S-erf op order
(`ref`), while the micro references exact-erf `jax.nn.gelu` (`mlp_bf16_gelu`).
This script runs the micro's EXACT check plus decompositions to localize
whether the kernel, the A&S erf at bf16-GELU inputs, or the micro's reference
is wrong.

Usage: python -u scripts/fused_verdict.py   (healthy window preferred)
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.ops.fused_mlp import _erf_as, _gelu_erf, fused_mlp
from hippomm_tpu.utils.device import fetch, warm_transport

print("transport:", warm_transport(), flush=True)

D = 1280
key = jax.random.PRNGKey(0)
# EXACT micro inputs (mlp_fused_micro.py:22-27, 77)
w1_f32 = 0.02 * jax.random.normal(key, (4 * D, D), jnp.float32)
b1 = jnp.zeros((4 * D,), jnp.float32)
w2_f32 = 0.02 * jax.random.normal(key, (D, 4 * D), jnp.float32)
b2 = jnp.zeros((D,), jnp.float32)
hh = jax.random.normal(jax.random.PRNGKey(4), (256, D), jnp.float32).astype(jnp.bfloat16)


def rel(got, want):
    g = got.astype(jnp.float32)
    w = want.astype(jnp.float32)
    return float(fetch(jnp.max(jnp.abs(g - w) / (jnp.abs(w) + 1e-2)), give_up_s=240.0))


def mlp_exact_gelu(h, w1, w2):  # the micro's reference op order
    y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    y = (y + b1).astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
    return z.astype(jnp.bfloat16)


def mlp_as_gelu(h, w1, w2):  # fused_dbg's reference op order (A&S erf, fp32)
    dt = h.dtype
    y = jnp.dot(h, w1.astype(dt).T, preferred_element_type=jnp.float32)
    y = (y + b1).astype(dt)
    y = 0.5 * y.astype(jnp.float32) * (1.0 + _erf_as(y.astype(jnp.float32) * 0.7071067811865476))
    y = y.astype(dt)
    z = jnp.dot(y, w2.astype(dt).T, preferred_element_type=jnp.float32)
    return (z + b2).astype(dt)


got = fused_mlp(hh, w1_f32.astype(jnp.bfloat16), b1, w2_f32.astype(jnp.bfloat16), b2)
want_exact = mlp_exact_gelu(hh, w1_f32, w2_f32)
want_as = mlp_as_gelu(hh, w1_f32.astype(jnp.bfloat16), w2_f32.astype(jnp.bfloat16))

print(f"A. kernel vs exact-gelu ref (the micro check): {rel(got, want_exact):.3e}", flush=True)
print(f"B. kernel vs A&S-erf ref (fused_dbg row 7):    {rel(got, want_as):.3e}", flush=True)
print(f"C. A&S ref vs exact ref (XLA vs XLA):          {rel(want_as, want_exact):.3e}", flush=True)

# D. the hidden pre-activations the GELU sees (micro weights: std 0.02*sqrt(1280)
#    ~ 0.72) — and the A&S erf vs exact erf on THAT distribution in isolation
h_pre = (jnp.dot(hh, w1_f32.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b1).astype(jnp.bfloat16)
g_as = _gelu_erf(h_pre)
g_ex = jax.nn.gelu(h_pre, approximate=False)
print(f"D. gelu_erf(A&S) vs exact gelu on the real h:  {rel(g_as, g_ex):.3e}", flush=True)
hmax = float(fetch(jnp.max(jnp.abs(h_pre.astype(jnp.float32)))))
print(f"   max |h_pre| = {hmax:.2f}", flush=True)

# E. localize: per-column + per-row error of the A check
err = jnp.abs(got.astype(jnp.float32) - want_exact.astype(jnp.float32))
ec = np.asarray(fetch(jnp.max(err, axis=0)))
er = np.asarray(fetch(jnp.max(err, axis=1)))
print(
    f"E. err-by-col mean={ec.mean():.3e} max={ec.max():.3e} argmax={int(ec.argmax())}; "
    f"rows>0.05: {int((er > 0.05).sum())}/{len(er)} first={int(np.argmax(er > 0.05))}",
    flush=True,
)

# F. same A-check at fp32 precision (dtype sensitivity)
got32 = fused_mlp(hh.astype(jnp.float32), w1_f32, b1, w2_f32, b2)
want32 = jnp.dot(
    jax.nn.gelu(jnp.dot(hh.astype(jnp.float32), w1_f32.T) + b1, approximate=False),
    w2_f32.T,
) + b2
print(f"F. fp32 kernel vs fp32 exact ref:              {rel(got32, want32):.3e}", flush=True)
print("done", flush=True)
