"""Vector/feature helpers (reference: hippomm/utils/vector_ops.py:1-188).

Full API parity with the reference's utils module — the two hot functions
(`cosine_similarity`, `top_k_cosine_similarity`) run as jitted XLA programs so a
query against an (N, 1024) feature store is a single fused normalize+matmul+top-k on
device; the remaining helpers are small host-side numpy (they operate on scalars or
tiny arrays in the reference and are not on any hot path).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


@jax.jit
def _cosine_sim_jit(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    return jnp.sum(a * b, axis=-1)


def cosine_similarity(a, b) -> float:
    """Cosine similarity between two vectors (reference: vector_ops.py:6-20)."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    return float(_cosine_sim_jit(a, b))


@partial(jax.jit, static_argnames=("k",))
def _topk_cosine_jit(query: jax.Array, feats: jax.Array, k: int):
    q = query / jnp.maximum(jnp.linalg.norm(query), _EPS)
    f = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), _EPS)
    # fp32 matmul: TPU's bf16 MXU default can flip near-tie rankings and
    # threshold gates the reference computes in numpy fp32 (same policy as
    # ops/similarity.py)
    sims = jnp.matmul(
        f, q, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (N,)
    vals, idx = jax.lax.top_k(sims, k)
    return vals, idx


def top_k_cosine_similarity(
    query: np.ndarray, features: np.ndarray, k: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k cosine similarity of `query` (D,) against `features` (N, D).

    Returns (indices, similarities) sorted descending — same contract as the
    reference (vector_ops.py:151-188) but as one fused device program instead of a
    numpy matmul + argsort.
    """
    query = np.asarray(query, dtype=np.float32).reshape(-1)
    features = np.asarray(features, dtype=np.float32)
    if features.ndim == 1:
        features = features[None, :]
    n = features.shape[0]
    k = min(int(k), n)
    if k <= 0:  # empty store or k=0: the reference's argsort path returns
        # empty arrays; clamping to 1 raised on a (0, D) store
        return np.zeros((0,), np.int64), np.zeros((0,), np.float32)
    vals, idx = _topk_cosine_jit(query, features, k)
    return np.asarray(idx), np.asarray(vals)


def compute_entropy(distribution) -> float:
    """Shannon entropy of a probability distribution (reference: vector_ops.py:22-35)."""
    p = np.asarray(distribution, dtype=np.float64)
    s = p.sum()
    if s <= 0:
        return 0.0
    p = p / s
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def temporal_overlap(start1, end1, start2, end2) -> float:
    """Fractional overlap of [start1,end1] and [start2,end2] relative to the shorter
    interval (reference: vector_ops.py:37-54)."""
    overlap = max(0.0, min(end1, end2) - max(start1, start2))
    shorter = max(_EPS, min(end1 - start1, end2 - start2))
    return float(overlap / shorter)


def spatial_distance(feat1, feat2, metric: str = "euclidean") -> float:
    """Distance between two feature vectors (reference: vector_ops.py:56-70)."""
    a = np.asarray(feat1, dtype=np.float32)
    b = np.asarray(feat2, dtype=np.float32)
    if metric == "euclidean":
        return float(np.linalg.norm(a - b))
    if metric == "cosine":
        return float(1.0 - cosine_similarity(a, b))
    raise ValueError(f"unknown metric: {metric}")


def feature_flow(features: np.ndarray) -> np.ndarray:
    """Per-step feature deltas over a (T, D) trajectory (reference: vector_ops.py:72-79)."""
    f = np.asarray(features, dtype=np.float32)
    if f.shape[0] < 2:
        return np.zeros((0,) + f.shape[1:], dtype=np.float32)
    return np.diff(f, axis=0)


def merge_features(features_list, weights=None) -> np.ndarray:
    """Weighted mean of a list of feature vectors (reference: vector_ops.py:81-100)."""
    feats = np.stack([np.asarray(f, dtype=np.float32) for f in features_list])
    if weights is None:
        return feats.mean(axis=0)
    w = np.asarray(weights, dtype=np.float32)
    w = w / max(w.sum(), _EPS)
    return (feats * w[:, None]).sum(axis=0)


def gaussian_temporal_weighting(times, center, sigma: float = 1.0) -> np.ndarray:
    """Gaussian weights of timestamps around a center (reference: vector_ops.py:102-108)."""
    t = np.asarray(times, dtype=np.float32)
    return np.exp(-0.5 * ((t - center) / max(sigma, _EPS)) ** 2)


def compute_feature_statistics(features: np.ndarray) -> Dict[str, np.ndarray]:
    """Mean/std/min/max over a (N, D) feature matrix (reference: vector_ops.py:110-122)."""
    f = np.asarray(features, dtype=np.float32)
    return {
        "mean": f.mean(axis=0),
        "std": f.std(axis=0),
        "min": f.min(axis=0),
        "max": f.max(axis=0),
    }


def normalize_features(features: np.ndarray) -> np.ndarray:
    """L2-normalize rows of a feature matrix (reference: vector_ops.py:124-149)."""
    f = np.asarray(features, dtype=np.float32)
    if f.ndim == 1:
        return f / max(np.linalg.norm(f), _EPS)
    norms = np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), _EPS)
    return f / norms
