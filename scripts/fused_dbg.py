"""On-hardware diagnostic battery for the fused MLP kernel.

Interpret mode is bit-exact but the v5e run measured rel err ~0.5 — this
isolates WHERE the real Mosaic lowering diverges: single grid step, hidden
revisit (j>1), multi-row-tile, the A&S erf alone, and an accumulate-in-output
variant. Tiny shapes; scalar fetches only.

Usage: python -u scripts/fused_dbg.py   (ideally via healthy_window_runner)
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hippomm_tpu.utils.device import fetch, warm_transport
from hippomm_tpu.ops.fused_mlp import fused_mlp, _erf_as, _gelu_erf

print("transport:", warm_transport(), flush=True)


def ref(x, w1, b1, w2, b2):
    dt = x.dtype
    h = jnp.dot(x, w1.astype(dt).T, preferred_element_type=jnp.float32)
    h = (h + b1.astype(jnp.float32)).astype(dt)
    y = 0.5 * h.astype(jnp.float32) * (1.0 + _erf_as(h.astype(jnp.float32) * 0.7071067811865476))
    y = y.astype(dt)
    out = jnp.dot(y, w2.astype(dt).T, preferred_element_type=jnp.float32)
    return (out + b2.astype(jnp.float32)).astype(dt)


def relerr(got, want):
    g = got.astype(jnp.float32)
    w = want.astype(jnp.float32)
    try:
        return float(fetch(jnp.max(jnp.abs(g - w) / (jnp.abs(w) + 1e-2)), give_up_s=240.0))
    except Exception as e:  # wedged window: keep the rest of the battery alive
        print(f"   (fetch wedged: {e})", flush=True)
        return float("nan")


# 1. erf alone in a trivial kernel vs the same formula in XLA
def _erf_kernel(x_ref, o_ref):
    o_ref[...] = _erf_as(x_ref[...])


xx = jnp.linspace(-4.0, 4.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
got_erf = pl.pallas_call(
    _erf_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
)(xx)
print(f"1. erf kernel vs XLA erf_as:     rel={relerr(got_erf, _erf_as(xx)):.3e}", flush=True)

# 2. gelu alone in a trivial kernel (bf16 in/out like the fused body)
def _gelu_kernel(x_ref, o_ref):
    o_ref[...] = _gelu_erf(x_ref[...])


xb = (xx / 2).astype(jnp.bfloat16)
got_g = pl.pallas_call(
    _gelu_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16)
)(xb)
print(f"2. gelu kernel vs XLA gelu_erf:  rel={relerr(got_g, _gelu_erf(xb)):.3e}", flush=True)

# 3-6. fused kernel at escalating grid complexity
for n, d, f, label in [
    (64, 128, 512, "3. single grid step (1,1)"),
    (64, 128, 1024, "4. hidden revisit   (1,2)"),
    (1024, 128, 512, "5. multi row tile   (2,1)"),
    (1024, 128, 1024, "6. both             (2,2)"),
]:
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (n, d), jnp.float32).astype(jnp.bfloat16)
    w1 = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (f, d), jnp.float32)
    b1 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (f,), jnp.float32)
    w2 = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (d, f), jnp.float32)
    b2 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,), jnp.float32)
    r = relerr(fused_mlp(x, w1, b1, w2, b2), ref(x, w1, b1, w2, b2))
    print(f"{label}: rel={r:.3e}", flush=True)

# 7. the exact failing config from mlp_fused_micro (N=256, D=1280, F=5120)
D = 1280
k = jax.random.PRNGKey(0)
hh = jax.random.normal(jax.random.PRNGKey(4), (256, D), jnp.float32).astype(jnp.bfloat16)
w1 = (0.02 * jax.random.normal(k, (4 * D, D), jnp.float32)).astype(jnp.bfloat16)
b1 = jnp.zeros((4 * D,), jnp.float32)
w2 = (0.02 * jax.random.normal(k, (D, 4 * D), jnp.float32)).astype(jnp.bfloat16)
b2 = jnp.zeros((D,), jnp.float32)
r = relerr(fused_mlp(hh, w1, b1, w2, b2), ref(hh, w1, b1, w2, b2))
print(f"7. micro shape (256,1280,5120) grid(1,10): rel={r:.3e}", flush=True)

# 7b. half-block kernel (LN prologue + residual epilogue) at the same
# escalating grid complexities + the micro shape
from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual, _ref_ln


def ref_hb(x, g, bt, w1, b1, w2, b2):
    t = _ref_ln(x, g, bt, 1e-6).astype(x.dtype)
    return x + ref(t, w1, b1, w2, b2)


for n, d, f, label in [
    (64, 128, 512, "7b. halfblock (1,1)"),
    (1024, 128, 1024, "7c. halfblock (2,2)"),
]:
    x = jax.random.normal(jax.random.PRNGKey(5), (n, d), jnp.float32).astype(jnp.bfloat16)
    g = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(6), (d,), jnp.float32)
    bt = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (d,), jnp.float32)
    w1h = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (f, d), jnp.float32)
    b1h = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (f,), jnp.float32)
    w2h = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (d, f), jnp.float32)
    b2h = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,), jnp.float32)
    r = relerr(
        fused_ln_mlp_residual(x, g, bt, w1h, b1h, w2h, b2h),
        ref_hb(x, g, bt, w1h, b1h, w2h, b2h),
    )
    print(f"{label}: rel={r:.3e}", flush=True)

gd = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(6), (D,), jnp.float32)
btd = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (D,), jnp.float32)
r = relerr(
    fused_ln_mlp_residual(hh, gd, btd, w1, b1, w2, b2),
    ref_hb(hh, gd, btd, w1, b1, w2, b2),
)
print(f"7d. halfblock micro shape grid(1,10): rel={r:.3e}", flush=True)

# 8. where: compare per-column max error to localize (fetch 1 row of stats)
got = fused_mlp(hh, w1, b1, w2, b2).astype(jnp.float32)
want = ref(hh, w1, b1, w2, b2).astype(jnp.float32)
err_col = jnp.max(jnp.abs(got - want), axis=0)  # (D,)
err_row = jnp.max(jnp.abs(got - want), axis=1)  # (N,)
ec = np.asarray(fetch(err_col))
er = np.asarray(fetch(err_row))
print(
    f"8. err by col: mean={ec.mean():.3e} argmax={int(ec.argmax())} max={ec.max():.3e}; "
    f"rows>0.05: {int((er > 0.05).sum())}/{len(er)} first_bad_row={int(np.argmax(er > 0.05))}",
    flush=True,
)
print("done", flush=True)
