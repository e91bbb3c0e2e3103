"""Parity tests for the fused MLP kernel (ops/fused_mlp.py).

Interpret mode on CPU; the oracle is models/layers.py:mlp (+ the encoder
block's output cast) — same op order (fp32 accum + fp32 bias → cast → erf
GELU in compute dtype → fp32 accum + fp32 bias → cast), with the kernel's
one documented deviation: erf is the A&S 7.1.26 polynomial (Mosaic has no
erf lowering), |erf err| ≤ 1.5e-7 absolute — pinned here on a dense grid —
so fp32 outputs agree to ~1e-5 and bf16 outputs to one rounding. Reference
behavior: torch nn.Sequential(Linear, GELU, Linear) inside the stock towers
(hippomm/models/foundation_models.py delegates to ImageBind/Whisper).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippomm_tpu.models import layers as L
from hippomm_tpu.ops.fused_mlp import (
    _erf_as,
    fused_mlp,
    fused_mlp_default,
    fused_mlp_supported,
    fused_mlp_vjp,
)


def test_erf_as_dense_grid():
    """A&S 7.1.26 against float64 erf: ≤6e-7 absolute everywhere (1.5e-7
    from the approximation + fp32 evaluation rounding — the kernel's only
    numerical deviation from the XLA MLP path, ~2000× under bf16 output
    resolution)."""
    from scipy.special import erf as erf64

    x = jnp.linspace(-10.0, 10.0, 200_001, dtype=jnp.float32)
    got = np.asarray(_erf_as(x), np.float64)
    want = erf64(np.asarray(x, np.float64))
    err = float(np.max(np.abs(got - want)))
    assert err <= 6e-7, err
    # odd symmetry + saturation
    np.testing.assert_allclose(np.asarray(_erf_as(-x)), -np.asarray(got), atol=1e-9)
    assert float(_erf_as(jnp.float32(10.0))) == 1.0


def _params(key, d, f):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": L.init_linear(k1, d, f),
        "fc2": L.init_linear(k2, f, d),
    }


def _oracle(p, x, dtype):
    return L.mlp(p, x.astype(dtype), dtype=dtype).astype(dtype)


@pytest.mark.parametrize(
    "n,d,f,dtype",
    [
        (64, 128, 512, jnp.float32),
        (64, 128, 512, jnp.bfloat16),
        (257 * 2, 128, 512, jnp.float32),   # odd N = B*T: pads 514 -> 520 rows
        (600, 128, 512, jnp.float32),       # N > bn with remainder: 600 -> 1024
    ],
)
def test_fused_mlp_matches_oracle(n, d, f, dtype):
    if not fused_mlp_supported(n, d, f):
        pytest.skip("shape outside the kernel gate")
    p = _params(jax.random.PRNGKey(0), d, f)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32).astype(dtype)
    got = fused_mlp(
        x, p["fc1"]["weight"], p["fc1"]["bias"], p["fc2"]["weight"], p["fc2"]["bias"],
        True,
    )
    want = _oracle(p, x, dtype)
    assert got.dtype == want.dtype
    if dtype == jnp.float32:
        # fp32: identical op order; only the A&S erf deviates (≤1.5e-7 per
        # GELU, summed through fc2's f terms → ~1e-5 at the output)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )
    else:
        # bf16: one bf16 rounding (the GELU runs fp32 internally) + the erf
        # deviation, both far under bf16 resolution
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_fused_mlp_multi_row_tiles():
    """n = 1024 with bn=512 exercises >1 row tile; f=512 one hidden chunk,
    f=1024 two chunks (accumulator revisit across j)."""
    for f in (512, 1024):
        p = _params(jax.random.PRNGKey(2), 128, f)
        x = jax.random.normal(jax.random.PRNGKey(3), (1024, 128), jnp.float32)
        got = fused_mlp(
            x, p["fc1"]["weight"], p["fc1"]["bias"], p["fc2"]["weight"], p["fc2"]["bias"],
            True,
        )
        want = _oracle(p, x, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )


def test_fused_mlp_supported_gate():
    assert fused_mlp_supported(128 * 257, 1280, 5120)   # ViT-H b128 (pads to 33280)
    assert fused_mlp_supported(32 * 257, 1280, 5120)    # ViT-H b32
    assert fused_mlp_supported(100, 1280, 5120)         # rows pad to 104
    assert fused_mlp_supported(1500, 1280, 5120)        # whisper-enc B=1 pads to 1536
    assert not fused_mlp_supported(4, 1280, 5120)       # too few rows
    assert not fused_mlp_supported(128, 1280, 5000)     # hidden not lane-aligned
    assert not fused_mlp_supported(128, 1000, 4000)     # feature not lane-aligned


def test_fused_mlp_gradients_match_oracle():
    p = _params(jax.random.PRNGKey(4), 128, 512)
    x = jax.random.normal(jax.random.PRNGKey(5), (64, 128), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(jnp.square(fused_mlp_vjp(x, w1, b1, w2, b2, True)))

    def loss_oracle(x, w1, b1, w2, b2):
        pp = {"fc1": {"weight": w1, "bias": b1}, "fc2": {"weight": w2, "bias": b2}}
        return jnp.sum(jnp.square(_oracle(pp, x, jnp.float32)))

    args = (x, p["fc1"]["weight"], p["fc1"]["bias"], p["fc2"]["weight"], p["fc2"]["bias"])
    g_fused = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g_oracle = jax.grad(loss_oracle, argnums=tuple(range(5)))(*args)
    for gf, go in zip(g_fused, g_oracle):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go), atol=1e-4, rtol=1e-4)


def test_fused_mlp_default_off_without_flag(monkeypatch):
    from hippomm_tpu.ops import fused_mlp as fm

    monkeypatch.delenv("HIPPOMM_FUSED_MLP", raising=False)
    fm.fused_mlp_default.cache_clear()
    assert fm.fused_mlp_default() is False
    monkeypatch.setenv("HIPPOMM_FUSED_MLP", "1")
    fm.fused_mlp_default.cache_clear()
    assert fm.fused_mlp_default() is True
    fm.fused_mlp_default.cache_clear()


def test_mlp_routes_fused_and_matches(monkeypatch):
    """Force the fused route through the SHARED mlp() and pin it against the
    default path — proves the product wiring (flatten/unflatten, weight
    passing), not just the kernel."""
    from hippomm_tpu.ops import fused_mlp as fm

    p = _params(jax.random.PRNGKey(6), 128, 512)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 128), jnp.float32)

    want = L.mlp(p, x, dtype=jnp.float32)

    calls = []
    real = fm.fused_mlp

    def spy(xx, w1, b1, w2, b2, interpret=False):
        calls.append(xx.shape)
        return real(xx, w1, b1, w2, b2, True)

    monkeypatch.setattr(fm, "fused_mlp_vjp", spy)
    monkeypatch.setattr(fm, "fused_mlp_default", lambda: True)
    got = L.mlp(p, x, dtype=jnp.float32, cast_out=True)
    assert calls == [(64, 128)]
    # mlp() returns fp32 (bias add) pre-cast; the fused kernel emits the
    # compute dtype — in fp32 the only deviation is the A&S erf (~1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_mlp_poly_gelu_close():
    """The exp-free polynomial GELU (bf16-only option) stays within bf16
    tolerance of the A&S path through the full kernel."""
    p = _params(jax.random.PRNGKey(8), 128, 512)
    x = jax.random.normal(jax.random.PRNGKey(9), (64, 128), jnp.float32).astype(jnp.bfloat16)
    a = fused_mlp(x, p["fc1"]["weight"], p["fc1"]["bias"], p["fc2"]["weight"],
                  p["fc2"]["bias"], True, "as")
    b = fused_mlp(x, p["fc1"]["weight"], p["fc1"]["bias"], p["fc2"]["weight"],
                  p["fc2"]["bias"], True, "poly")
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-2, rtol=2e-2
    )


def test_gelu_erf_poly_accuracy():
    from hippomm_tpu.ops.fused_mlp import _gelu_erf, _gelu_erf_poly

    x = jnp.linspace(-10.0, 10.0, 100_001, dtype=jnp.float32)
    a = np.asarray(_gelu_erf(x), np.float64)
    b = np.asarray(_gelu_erf_poly(x), np.float64)
    # abs err <= 0.5*|x|*4.5e-4 inside |x|<5.7; exact tails
    bound = 0.5 * np.abs(np.asarray(x)) * 4.6e-4 + 1e-6
    assert np.all(np.abs(a - b) <= bound)


# ---------------------------------------------------------------------------
# Half-block kernel: out = x + mlp(LN(x)) (LN prologue + residual epilogue)
# ---------------------------------------------------------------------------


def _ln_params(key, d):
    # non-trivial affine so the LN prologue's gamma/beta wiring is exercised
    k1, k2 = jax.random.split(key)
    return {
        "weight": 1.0 + 0.1 * jax.random.normal(k1, (d,), jnp.float32),
        "bias": 0.1 * jax.random.normal(k2, (d,), jnp.float32),
    }


def _halfblock_oracle(pn, pm, x, dtype, eps=1e-6):
    return x + L.mlp(
        pm, L.layer_norm(pn, x, eps, out_dtype=dtype), dtype=dtype, cast_out=True
    ).astype(dtype)


@pytest.mark.parametrize(
    "n,d,f,dtype",
    [
        (64, 128, 512, jnp.float32),
        (64, 128, 512, jnp.bfloat16),
        (600, 128, 1024, jnp.float32),  # padded rows + accumulator revisit
    ],
)
def test_fused_ln_mlp_residual_matches_oracle(n, d, f, dtype):
    from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual

    pm = _params(jax.random.PRNGKey(10), d, f)
    pn = _ln_params(jax.random.PRNGKey(11), d)
    x = jax.random.normal(jax.random.PRNGKey(12), (n, d), jnp.float32).astype(dtype)
    got = fused_ln_mlp_residual(
        x, pn["weight"], pn["bias"],
        pm["fc1"]["weight"], pm["fc1"]["bias"],
        pm["fc2"]["weight"], pm["fc2"]["bias"],
        1e-6, True,
    )
    want = _halfblock_oracle(pn, pm, x, dtype)
    assert got.dtype == want.dtype
    if dtype == jnp.float32:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )
    else:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_fused_ln_mlp_residual_gradients():
    from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual_vjp

    pm = _params(jax.random.PRNGKey(13), 128, 512)
    pn = _ln_params(jax.random.PRNGKey(14), 128)
    x = jax.random.normal(jax.random.PRNGKey(15), (64, 128), jnp.float32)
    args = (x, pn["weight"], pn["bias"], pm["fc1"]["weight"], pm["fc1"]["bias"],
            pm["fc2"]["weight"], pm["fc2"]["bias"])

    def loss_fused(*a):
        return jnp.sum(jnp.square(fused_ln_mlp_residual_vjp(*a, 1e-6, True)))

    def loss_oracle(x, g, b, w1, b1, w2, b2):
        pn2 = {"weight": g, "bias": b}
        pm2 = {"fc1": {"weight": w1, "bias": b1}, "fc2": {"weight": w2, "bias": b2}}
        return jnp.sum(jnp.square(_halfblock_oracle(pn2, pm2, x, jnp.float32)))

    g_f = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_o = jax.grad(loss_oracle, argnums=tuple(range(7)))(*args)
    for gf, go in zip(g_f, g_o):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go), atol=1e-4, rtol=1e-4)


def test_fused_block_default_off_without_flag(monkeypatch):
    from hippomm_tpu.ops import fused_mlp as fm

    monkeypatch.delenv("HIPPOMM_FUSED_BLOCK", raising=False)
    fm.fused_block_default.cache_clear()
    assert fm.fused_block_default() is False
    monkeypatch.setenv("HIPPOMM_FUSED_BLOCK", "1")
    fm.fused_block_default.cache_clear()
    assert fm.fused_block_default() is True
    fm.fused_block_default.cache_clear()


def test_halfblock_routes_fused_and_matches(monkeypatch):
    """Force the half-block route through the SHARED _mlp_halfblock and pin
    it against the default path — proves the product wiring (norm_2 params,
    flatten/unflatten), not just the kernel."""
    from hippomm_tpu.ops import fused_mlp as fm

    pm = _params(jax.random.PRNGKey(16), 128, 512)
    pn = _ln_params(jax.random.PRNGKey(17), 128)
    p = {"mlp": pm, "norm_2": pn}
    x = jax.random.normal(jax.random.PRNGKey(18), (2, 32, 128), jnp.float32)

    want = L._mlp_halfblock(p, x, 1e-6, jnp.float32)

    calls = []
    real = fm.fused_ln_mlp_residual

    def spy(xx, g, b, w1, b1, w2, b2, eps=1e-6, interpret=False):
        calls.append(xx.shape)
        return real(xx, g, b, w1, b1, w2, b2, eps, True)

    monkeypatch.setattr(fm, "fused_ln_mlp_residual_vjp", spy)
    monkeypatch.setattr(fm, "fused_block_default", lambda: True)
    got = L._mlp_halfblock(p, x, 1e-6, jnp.float32)
    assert calls == [(64, 128)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_ln_mlp_residual_bn_override():
    """The static bn override (VMEM-fallback schedule) pads N to the chosen
    tile and matches the default-schedule output exactly."""
    from hippomm_tpu.ops.fused_mlp import fused_ln_mlp_residual

    pm = _params(jax.random.PRNGKey(19), 128, 512)
    pn = _ln_params(jax.random.PRNGKey(20), 128)
    x = jax.random.normal(jax.random.PRNGKey(21), (600, 128), jnp.float32)
    args = (x, pn["weight"], pn["bias"], pm["fc1"]["weight"], pm["fc1"]["bias"],
            pm["fc2"]["weight"], pm["fc2"]["bias"])
    a = fused_ln_mlp_residual(*args, 1e-6, True)
    b = fused_ln_mlp_residual(*args, 1e-6, True, None, 256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)
