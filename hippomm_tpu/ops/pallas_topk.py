"""Pallas TPU kernel: streaming fused cosine top-k over a feature store.

The XLA path (ops/similarity.top_k_cosine) materializes the full (N,)
similarity vector in HBM before lax.top_k. At memory-store scale (hours of
video → 10⁵-10⁶ key-frame rows) retrieval is HBM-bandwidth-bound, so this
kernel streams (TILE_N, D) tiles HBM→VMEM once, computes
normalize→dot→running-top-k entirely on-chip (MXU for the dot, VPU for the
merge), and writes just k values + k indices back. One pass over the store,
zero intermediate HBM traffic.

Grid steps run sequentially on a TPU core, so the VMEM scratch carries the
running top-k across tiles (pallas_guide.md: Grid/BlockSpec + scratch).
`lax.top_k` has no Pallas-TPU lowering, so the k-merge is a statically
unrolled select-max loop. Layout matters enormously here: the merge operates
on a (tile_n/128 + 1, 128) candidate matrix — full 128-lane rows with the
running top-k carried as one extra row — rather than a (1, tile_n + k) vector
(which wastes 7/8 sublanes and measured ~2× slower on v5e).

RETIRED from the product path (kept as a tested reference implementation —
exact vs the dense oracle, parity tests in tests/test_pallas_topk.py). Final
hardware verdict (TPU v5e, 2e5×1024 fp32, k=20, read-synced timing): XLA over
a once-normalized store runs 1.10 ms/query, XLA with per-query normalization
2.39 ms, this kernel 4.17 ms. A single-query recall is a mat-VEC — both paths
are HBM-bound, and once the store is normalized ONCE at device upload
(retrieval/search.FeatureSearchIndex._device_feats) the XLA program is a
single streaming matmul+top_k that this kernel's tile merge cannot beat. The
former HIPPOMM_PALLAS_TOPK opt-in was removed with that measurement
(VERDICT r2 Weak #7: "win or retire").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # python float: jnp module-level constants become captured tracers
_BIG_IDX = 2**30
_LANES = 128


def _topk_kernel(
    q_ref, f_ref, vals_ref, idx_ref, sv_ref, si_ref, kth_ref, *, k, tile_n, n_valid
):
    """One grid step: merge this tile's sims into the running top-k scratch.

    Scratches sv/si are (1, 128) rows (k <= 128); candidates live in a
    (tile_n/128 + 1, 128) matrix whose last row is the running top-k.

    Threshold early-skip: the sequential k-maxima merge only runs when this
    tile's best similarity beats the running k-th value (kth_ref, SMEM). After
    the first few tiles the running top-k is hard to beat, so the expected
    per-tile cost collapses to dot + one reduce-max — the kernel approaches
    pure HBM streaming. Worst case (ascending-sorted stores) degrades to a
    merge per tile; correctness is unaffected.
    """
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    rows = tile_n // _LANES

    @pl.when(step == 0)
    def _init():
        sv_ref[:] = jnp.full_like(sv_ref, _NEG)
        si_ref[:] = jnp.zeros_like(si_ref)
        kth_ref[0, 0] = _NEG

    f = f_ref[:]  # (tile_n, D) fp32
    q = q_ref[:]  # (1, D) pre-normalized query
    inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(f * f, axis=1, keepdims=True), 1e-16))
    sims = jnp.dot(f * inv_norm, q.T, preferred_element_type=jnp.float32)  # (tile_n, 1)
    sims = sims.reshape(rows, _LANES)

    base = step * tile_n
    row_ids = base + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )
    sims = jnp.where(row_ids < n_valid, sims, _NEG)
    tile_best = jnp.max(sims)

    @pl.when(tile_best > kth_ref[0, 0])
    def _merge():
        # (rows + 1, 128) candidates: tile sims + the running top-k row
        all_v = jnp.concatenate([sims, sv_ref[0:1, :]], axis=0)
        all_i = jnp.concatenate([row_ids, si_ref[0:1, :]], axis=0)
        lin = (
            jax.lax.broadcasted_iota(jnp.int32, (rows + 1, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows + 1, _LANES), 1)
        )
        kcols = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        new_v = jnp.full((1, _LANES), _NEG, jnp.float32)
        new_i = jnp.zeros((1, _LANES), jnp.int32)
        kth = jnp.float32(_NEG)
        for j in range(k):
            m = jnp.max(all_v)  # scalar
            pos = jnp.min(jnp.where(all_v == m, lin, _BIG_IDX))  # scalar linear idx
            take = lin == pos
            ci = jnp.sum(jnp.where(take, all_i, 0))  # scalar original index
            sel = kcols == j
            new_v = jnp.where(sel, m, new_v)
            new_i = jnp.where(sel, ci, new_i)
            all_v = jnp.where(take, _NEG, all_v)
            if j == k - 1:
                kth = m
        sv_ref[0:1, :] = new_v
        si_ref[0:1, :] = new_i
        kth_ref[0, 0] = kth

    @pl.when(step == nsteps - 1)
    def _finish():
        vals_ref[0] = sv_ref[0]
        idx_ref[0] = si_ref[0]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_top_k_cosine(
    query: jax.Array,
    feats: jax.Array,
    k: int,
    tile_n: int = 1024,
    interpret: bool = False,
):
    """query (D,), feats (N, D) → (values (k,), indices (k,)) exact top-k by
    cosine similarity. N is padded to tile_n internally; pad rows masked.
    k <= 128 by contract (retrieval uses k ≤ ~64)."""
    if k > _LANES:
        raise ValueError(f"k={k} exceeds kernel contract (<= {_LANES})")
    if tile_n % _LANES:
        raise ValueError(f"tile_n={tile_n} must be a multiple of {_LANES}")
    n, d = feats.shape
    pad = (-n) % tile_n
    if pad:
        feats = jnp.concatenate([feats, jnp.zeros((pad, d), feats.dtype)])
    q = query.astype(jnp.float32)
    q = (q / jnp.maximum(jnp.linalg.norm(q), 1e-8))[None, :]  # (1, D)
    nsteps = (n + pad) // tile_n

    kernel = functools.partial(_topk_kernel, k=k, tile_n=tile_n, n_valid=n)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _LANES), jnp.float32),
            pltpu.VMEM((1, _LANES), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, feats.astype(jnp.float32))
    return vals[0, :k], idx[0, :k]


