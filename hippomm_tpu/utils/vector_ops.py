"""Vector/feature helpers (reference: hippomm/utils/vector_ops.py:1-188).

Full API parity with the reference's utils module — the two hot functions
(`cosine_similarity`, `top_k_cosine_similarity`) run as jitted XLA programs so a
query against an (N, 1024) feature store is a single fused normalize+matmul+top-k on
device; the remaining helpers are small host-side numpy (they operate on scalars or
tiny arrays in the reference and are not on any hot path).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

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


def compute_entropy(features) -> float:
    """Entropy of a feature vector: |features| normalized to a probability
    distribution, then Shannon entropy (reference: vector_ops.py:22-35)."""
    p = np.abs(np.asarray(features, dtype=np.float64).reshape(-1))
    s = p.sum()
    if s <= 0:
        return 0.0
    p = p / s
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def temporal_overlap(
    t1: Tuple[float, float], t2: Tuple[float, float], threshold: float = 0.5
) -> bool:
    """True when two (start, end) intervals overlap by at least `threshold` of
    the shorter interval (reference: vector_ops.py:37-54 — same tuple
    signature and bool contract)."""
    start1, end1 = t1
    start2, end2 = t2
    overlap = min(end1, end2) - max(start1, start2)
    if overlap <= 0:
        return False
    shorter = min(end1 - start1, end2 - start2)
    return bool(overlap / max(shorter, _EPS) >= threshold)


def spatial_distance(
    coord1: Tuple[int, int],
    coord2: Tuple[int, int],
    grid_size: Tuple[int, int] = (16, 16),
) -> float:
    """Euclidean distance between grid coordinates, normalized by the grid
    diagonal (reference: vector_ops.py:56-70 — grid-coordinate semantics)."""
    x1, y1 = coord1
    x2, y2 = coord2
    dist = float(np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2))
    max_dist = float(np.sqrt(grid_size[0] ** 2 + grid_size[1] ** 2))
    return dist / max(max_dist, _EPS)


def feature_flow(features1, features2, threshold: float = 0.7) -> bool:
    """True when two feature vectors are cosine-similar enough to be a smooth
    flow (reference: vector_ops.py:72-79 — two vectors + threshold → bool)."""
    return bool(cosine_similarity(features1, features2) >= threshold)


def merge_features(features_list, weights=None) -> np.ndarray:
    """Weighted sum of feature vectors, L2-normalized (reference:
    vector_ops.py:81-100 — weights are NOT normalized before summing; the
    merged vector IS)."""
    if weights is None:
        weights = [1.0] * len(features_list)
    feats = np.stack(
        [np.asarray(f, dtype=np.float32).reshape(-1) for f in features_list]
    )
    w = np.asarray(weights, dtype=np.float32)
    merged = (feats * w[:, None]).sum(axis=0)
    return merged / max(np.linalg.norm(merged), _EPS)


def gaussian_temporal_weighting(times, center, sigma: float = 1.0) -> np.ndarray:
    """Gaussian *pdf* of timestamps around a center (reference:
    vector_ops.py:102-108 uses scipy.stats.norm.pdf — the 1/(σ√2π) factor is
    part of the contract, weights do not peak at 1)."""
    t = np.asarray(times, dtype=np.float64)
    sigma = max(float(sigma), _EPS)
    return np.exp(-0.5 * ((t - center) / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))


def compute_feature_statistics(features) -> Tuple[float, float, float]:
    """(mean, std, entropy) of a flattened feature vector (reference:
    vector_ops.py:110-122 — scalar tuple, not per-dimension arrays)."""
    f = np.asarray(features, dtype=np.float32).reshape(-1)
    return float(f.mean()), float(f.std()), float(compute_entropy(f))


def normalize_features(features, method: str = "l2") -> np.ndarray:
    """Normalize a flattened feature vector by l2 / l1 / max norm (reference:
    vector_ops.py:124-149 — flattens, method-selectable)."""
    f = np.asarray(features, dtype=np.float32).reshape(-1)
    if method == "l2":
        denom = np.linalg.norm(f)
    elif method == "l1":
        denom = np.sum(np.abs(f))
    elif method == "max":
        denom = np.max(np.abs(f))
    else:
        raise ValueError(f"Unknown normalization method: {method}")
    return f / max(float(denom), _EPS)
