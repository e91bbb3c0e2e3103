"""Parity tests for the fused Pallas attention kernel (ops/flash_attention.py).

Runs in interpreter mode on CPU (no Mosaic lowering here); the oracle is the
exact einsum pair from models/layers.py:attention — fp32 logits & softmax,
compute-dtype value matmul, fp32 accumulation. Shapes mirror the real towers:
ViT-H vision (hd=80, T=257), ImageBind audio trunk with its appended bias_kv
position (Tk = Tq + 1), and the Whisper encoder's multi-q-block regime
(Tq > 512). Reference semantics: torch F.multi_head_attention_forward inside
the stock towers the reference loads (hippomm/models/foundation_models.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippomm_tpu.ops.flash_attention import flash_mha, flash_supported


def oracle(q, k, v, scale):
    dt = q.dtype
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q.astype(dt), k.astype(dt),
                   preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(dt), v.astype(dt),
                      preferred_element_type=jnp.float32)


def _mk(shape, key, dtype):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize(
    "b,h,tq,tk,hd,dtype,tol",
    [
        (2, 4, 257, 257, 80, jnp.float32, 1e-5),   # ViT-H vision shape
        (2, 4, 257, 257, 80, jnp.bfloat16, 2e-2),
        (1, 3, 230, 231, 64, jnp.float32, 1e-5),   # audio trunk: bias_kv appends one key
        (1, 2, 600, 600, 64, jnp.float32, 1e-5),   # multi-q-block path (Tq > 512)
        (1, 1, 8, 8, 16, jnp.float32, 1e-5),       # tiny odd head_dim
    ],
)
def test_flash_matches_einsum(b, h, tq, tk, hd, dtype, tol):
    q = _mk((b, h, tq, hd), 0, dtype)
    k = _mk((b, h, tk, hd), 1, dtype)
    v = _mk((b, h, tk, hd), 2, dtype)
    scale = 1.0 / np.sqrt(hd)
    got = flash_mha(q, k, v, float(scale), True)
    want = oracle(q, k, v, scale)
    # the kernel emits the COMPUTE dtype (the out-projection casts to it
    # anyway): fp32 in -> fp32 out, bf16 in -> bf16 out == cast(fp32 out)
    assert got.dtype == q.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want.astype(q.dtype), np.float32),
        atol=tol, rtol=tol,
    )


def test_flash_gradients_match_einsum():
    b, h, t, hd = 1, 2, 64, 32
    q = _mk((b, h, t, hd), 3, jnp.float32)
    k = _mk((b, h, t, hd), 4, jnp.float32)
    v = _mk((b, h, t, hd), 5, jnp.float32)
    scale = float(1.0 / np.sqrt(hd))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_mha(q, k, v, scale, True)))

    def loss_oracle(q, k, v):
        return jnp.sum(jnp.square(oracle(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for gf, go in zip(g_flash, g_oracle):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go), atol=1e-4, rtol=1e-4)


def test_supported_gate():
    assert flash_supported(257, 257, 80)
    assert flash_supported(1500, 1500, 64)     # Whisper encoder
    assert not flash_supported(257, 257, 256)  # head_dim beyond one lane tile
    assert not flash_supported(4096, 4096, 64)  # Tk beyond the VMEM budget


def test_profitable_policy():
    from hippomm_tpu.ops.flash_attention import flash_profitable

    assert flash_profitable(1500, 1500, 64)      # Whisper encoder: kernel wins
    assert flash_profitable(230, 231, 64)        # audio trunk: kernel wins
    assert flash_profitable(257, 257, 80)        # ViT-H: wins since G-blocking
    assert not flash_profitable(4096, 4096, 64)  # unsupported → never routed


def test_product_path_unchanged_on_cpu():
    """On CPU backends the shared attention must keep the einsum path (flash
    'auto' routes TPU-only), so every hermetic tower test pins the same
    numerics it always did."""
    from hippomm_tpu.ops.flash_attention import flash_default

    flash_default.cache_clear()
    assert flash_default() is False


# ---------------------------------------------------------------------------
# Transpose-free (B, T, H, hd) kernel
# ---------------------------------------------------------------------------


def oracle_bthd(q, k, v, scale):
    dt = q.dtype
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q.astype(dt), k.astype(dt),
                   preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(dt), v.astype(dt),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "b,h,tq,tk,hd,dtype,tol",
    [
        (2, 16, 257, 257, 80, jnp.float32, 1e-5),   # ViT-H shape (gh=8)
        (2, 16, 257, 257, 80, jnp.bfloat16, 2e-2),
        (1, 8, 230, 231, 64, jnp.float32, 1e-5),    # audio trunk (+bias_kv key)
        (1, 4, 33, 33, 16, jnp.float32, 1e-5),      # tiny heads: gh == h
    ],
)
def test_bthd_matches_einsum(b, h, tq, tk, hd, dtype, tol):
    from hippomm_tpu.ops.flash_attention import flash_mha_bthd

    q = _mk((b, tq, h, hd), 10, dtype)
    k = _mk((b, tk, h, hd), 11, dtype)
    v = _mk((b, tk, h, hd), 12, dtype)
    scale = float(1.0 / np.sqrt(hd))
    got = flash_mha_bthd(q, k, v, scale, True)
    want = oracle_bthd(q, k, v, scale)
    assert got.dtype == q.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want.astype(q.dtype), np.float32),
        atol=tol, rtol=tol,
    )


def test_bthd_matches_transposing_kernel():
    """The two layouts must be the SAME function: bthd(q,k,v) equals the
    product bhtd kernel on the transposed operands, element for element."""
    from hippomm_tpu.ops.flash_attention import flash_mha_bthd

    q = _mk((2, 37, 8, 80), 13, jnp.float32)
    k = _mk((2, 41, 8, 80), 14, jnp.float32)
    v = _mk((2, 41, 8, 80), 15, jnp.float32)
    got = flash_mha_bthd(q, k, v, 0.1, True)
    ref = flash_mha(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        0.1, True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_bthd_gradients_match_einsum():
    from hippomm_tpu.ops.flash_attention import flash_mha_bthd

    b, t, h, hd = 1, 24, 2, 32
    q = _mk((b, t, h, hd), 16, jnp.float32)
    k = _mk((b, t, h, hd), 17, jnp.float32)
    v = _mk((b, t, h, hd), 18, jnp.float32)
    scale = float(1.0 / np.sqrt(hd))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_mha_bthd(q, k, v, scale, True)))

    def loss_oracle(q, k, v):
        return jnp.sum(jnp.square(oracle_bthd(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for gf, go in zip(g_flash, g_oracle):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go), atol=1e-4, rtol=1e-4)


def test_bthd_supported_gate():
    from hippomm_tpu.ops.flash_attention import bthd_supported

    assert bthd_supported(128, 16, 257, 257, 80)     # ViT-H b128
    assert bthd_supported(1, 8, 230, 231, 64)        # audio trunk
    assert bthd_supported(1, 4, 33, 33, 16)          # tiny heads: gh == h
    assert not bthd_supported(8, 20, 1500, 1500, 64)  # Whisper enc: logits too big
    assert not bthd_supported(1, 12, 64, 64, 32)      # H=12: no safe head grouping
    assert not bthd_supported(1, 8, 64, 64, 256)      # head_dim beyond one lane tile


def test_bthd_default_off_without_flag(monkeypatch):
    from hippomm_tpu.ops import flash_attention as fa

    monkeypatch.delenv("HIPPOMM_FLASH_BTHD", raising=False)
    fa.bthd_default.cache_clear()
    assert fa.bthd_default() is False
    monkeypatch.setenv("HIPPOMM_FLASH_BTHD", "1")
    fa.bthd_default.cache_clear()
    assert fa.bthd_default() is True
    fa.bthd_default.cache_clear()


def test_attention_routes_bthd_and_matches_einsum(monkeypatch):
    """Force the transpose-free route through the SHARED attention() and pin
    it against the default einsum path — proves the product wiring (reshapes,
    qkv slicing, out-projection) is layout-correct, not just the kernel."""
    import functools as ft

    from hippomm_tpu.models import layers as L
    from hippomm_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(42)
    p = L.init_attention(key, 64, packed=True)
    x = _mk((2, 33, 64), 19, jnp.float32)

    want = L.attention(p, x, num_heads=8, dtype=jnp.float32)

    calls = []
    real = fa.flash_mha_bthd

    def spy(q, k, v, scale, interpret=False):
        calls.append(q.shape)
        return real(q, k, v, scale, True)  # interpret: no Mosaic on CPU

    monkeypatch.setattr(fa, "flash_default", lambda: True)
    monkeypatch.setattr(fa, "bthd_default", lambda: True)
    monkeypatch.setattr(fa, "flash_mha_bthd", spy)
    got = L.attention(p, x, num_heads=8, dtype=jnp.float32)
    assert calls == [(2, 33, 8, 8)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "b,h,tq,tk,hd,dtype,tol",
    [
        (2, 4, 257, 257, 80, jnp.float32, 1e-5),   # CLS-split, exact exp (fp32)
        (2, 4, 257, 257, 80, jnp.bfloat16, 2e-2),  # CLS-split + fast exp
        (1, 3, 230, 231, 64, jnp.bfloat16, 2e-2),  # not splittable: fast exp only
        (1, 2, 600, 600, 64, jnp.bfloat16, 2e-2),  # multi-q-block + fast exp
    ],
)
def test_flash_softmax_opt_matches_einsum(b, h, tq, tk, hd, dtype, tol):
    """softmax_opt=True (CLS-split schedule where Tk ≡ 1 mod 128, polynomial
    fast-exp for bf16) stays within the same tolerances as the legacy body."""
    q = _mk((b, h, tq, hd), 0, dtype)
    k = _mk((b, h, tk, hd), 1, dtype)
    v = _mk((b, h, tk, hd), 2, dtype)
    scale = 1.0 / np.sqrt(hd)
    got = flash_mha(q, k, v, float(scale), True, True)
    want = oracle(q, k, v, scale)
    assert got.dtype == q.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want.astype(q.dtype), np.float32),
        atol=tol, rtol=tol,
    )


def test_fast_exp_accuracy_grid():
    """Polynomial exp vs libm over the post-max-subtraction domain."""
    from hippomm_tpu.ops.flash_attention import _fast_exp

    x = jnp.linspace(-87.0, 0.0, 100_001, dtype=jnp.float32)
    got = np.asarray(_fast_exp(x), np.float64)
    want = np.exp(np.asarray(x, np.float64))
    rel = np.max(np.abs(got - want) / np.maximum(want, 1e-30))
    assert rel < 2e-5, rel
    # deep tail flushes to a denormal-scale floor, never NaN/negative
    deep = _fast_exp(jnp.float32(-3.0e38))
    assert np.isfinite(float(deep)) and float(deep) >= 0.0


def test_cls_splittable_gate():
    from hippomm_tpu.ops.flash_attention import cls_splittable

    assert cls_splittable(257)       # ViT-H / ViT-L vision towers
    assert cls_splittable(129)
    assert not cls_splittable(256)
    assert not cls_splittable(1500)  # whisper encoder
    assert not cls_splittable(231)   # audio trunk with bias_kv
    assert not cls_splittable(1)


def test_softmax_opt_policy_gating(monkeypatch):
    """softmax_opt auto-enables on TPU backends only (measured 45.91 vs 57.78
    ms/32L at ViT-H b128); fast-exp stays OFF by default (measured loss) and
    needs its own flag."""
    from hippomm_tpu.ops import flash_attention as fa

    monkeypatch.delenv("HIPPOMM_FLASH_SOFTMAX_OPT", raising=False)
    fa.softmax_opt_default.cache_clear()
    assert fa.softmax_opt_default() is False  # tests run on CPU
    monkeypatch.setenv("HIPPOMM_FLASH_SOFTMAX_OPT", "1")
    fa.softmax_opt_default.cache_clear()
    assert fa.softmax_opt_default() is True
    fa.softmax_opt_default.cache_clear()

    monkeypatch.delenv("HIPPOMM_FLASH_FASTEXP", raising=False)
    fa._fast_exp_enabled.cache_clear()
    assert fa._fast_exp_enabled() is False
    monkeypatch.setenv("HIPPOMM_FLASH_FASTEXP", "1")
    fa._fast_exp_enabled.cache_clear()
    assert fa._fast_exp_enabled() is True
    fa._fast_exp_enabled.cache_clear()
