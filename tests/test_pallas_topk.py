"""Pallas streaming top-k kernel vs XLA/numpy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from hippomm_tpu.ops.pallas_topk import pallas_top_k_cosine


def oracle(q, f, k):
    fn = f / np.linalg.norm(f, axis=1, keepdims=True)
    sims = fn @ (q / np.linalg.norm(q))
    order = np.argsort(-sims)[:k]
    return sims[order], order


def test_pallas_topk_exact(rng):
    f = rng.normal(size=(1000, 256)).astype(np.float32)
    q = rng.normal(size=256).astype(np.float32)
    vals, idx = pallas_top_k_cosine(jnp.asarray(q), jnp.asarray(f), k=8, tile_n=128, interpret=True)
    want_v, want_i = oracle(q, f, 8)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(vals), want_v, rtol=1e-5, atol=1e-5)


def test_pallas_topk_unpadded_boundary(rng):
    """N not a multiple of tile_n: pad rows must never win."""
    f = rng.normal(size=(130, 64)).astype(np.float32) * 0.01  # small sims
    q = rng.normal(size=64).astype(np.float32)
    vals, idx = pallas_top_k_cosine(jnp.asarray(q), jnp.asarray(f), k=5, tile_n=128, interpret=True)
    assert np.asarray(idx).max() < 130
    want_v, want_i = oracle(q, f, 5)
    np.testing.assert_array_equal(np.asarray(idx), want_i)


def test_pallas_topk_single_tile(rng):
    f = rng.normal(size=(64, 128)).astype(np.float32)
    q = f[17]  # self-match
    vals, idx = pallas_top_k_cosine(jnp.asarray(q), jnp.asarray(f), k=3, tile_n=128, interpret=True)
    assert int(np.asarray(idx)[0]) == 17
    assert float(np.asarray(vals)[0]) > 0.999
