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
unrolled select-max loop (reduce_max + first-match index + mask), which the
VPU handles in registers — k is small (≤64) by contract.
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


def _topk_kernel(q_ref, f_ref, vals_ref, idx_ref, sv_ref, si_ref, *, k, tile_n, n_valid):
    """One grid step: merge this tile's sims into the running top-k scratch."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        sv_ref[:] = jnp.full_like(sv_ref, _NEG)
        si_ref[:] = jnp.zeros_like(si_ref)

    f = f_ref[:]  # (tile_n, D) fp32
    q = q_ref[:]  # (1, D) pre-normalized query
    inv_norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(f * f, axis=1, keepdims=True), 1e-16))
    sims = jnp.dot(f * inv_norm, q.T, preferred_element_type=jnp.float32)  # (tile_n, 1)
    sims = sims.reshape(1, tile_n)

    base = step * tile_n
    row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    sims = jnp.where(row_ids < n_valid, sims, _NEG)

    # merge (k running + tile_n new) -> top k, via k unrolled masked maxima.
    # Scalar VMEM stores don't lower on TPU, so selections accumulate into
    # (1, k) vectors through one-hot selects and we store whole rows.
    all_v = jnp.concatenate([sv_ref[0:1, :], sims], axis=1)  # (1, k + tile_n)
    all_i = jnp.concatenate([si_ref[0:1, :], row_ids], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, k + tile_n), 1)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    new_v = jnp.full((1, k), _NEG, jnp.float32)
    new_i = jnp.zeros((1, k), jnp.int32)
    for j in range(k):
        m = jnp.max(all_v, axis=1, keepdims=True)  # (1, 1)
        pos = jnp.min(jnp.where(all_v == m, cols, _BIG_IDX), axis=1, keepdims=True)
        take = cols == pos
        ci = jnp.sum(jnp.where(take, all_i, 0), axis=1, keepdims=True)  # (1, 1)
        sel = kcols == j
        new_v = jnp.where(sel, m, new_v)
        new_i = jnp.where(sel, ci, new_i)
        all_v = jnp.where(take, _NEG, all_v)
    sv_ref[0:1, :] = new_v
    si_ref[0:1, :] = new_i

    @pl.when(step == nsteps - 1)
    def _finish():
        vals_ref[0] = sv_ref[0]
        idx_ref[0] = si_ref[0]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_top_k_cosine(
    query: jax.Array,
    feats: jax.Array,
    k: int,
    tile_n: int = 512,
    interpret: bool = False,
):
    """query (D,), feats (N, D) → (values (k,), indices (k,)) exact top-k by
    cosine similarity. N is padded to tile_n internally; pad rows masked."""
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
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.int32),
        ],
        interpret=interpret,
    )(q, feats.astype(jnp.float32))
    return vals[0], idx[0]


def top_k_cosine_auto(query, feats, k: int):
    """Route to the Pallas kernel on TPU when HIPPOMM_PALLAS_TOPK=1, else the
    fused XLA path. Opt-in for now: this environment's remote-compile tunnel
    makes Mosaic kernel compiles minutes-slow, while the XLA program compiles
    in seconds and is within noise at ≤10⁵-row stores; flip the default once
    store sizes or direct-attached hardware justify it."""
    import os

    from hippomm_tpu.ops.similarity import top_k_cosine

    if (
        os.environ.get("HIPPOMM_PALLAS_TOPK") == "1"
        and jax.devices()[0].platform == "tpu"
        and feats.shape[0] >= 2048
        and k <= 64
    ):
        return pallas_top_k_cosine(jnp.asarray(query), jnp.asarray(feats), k)
    return top_k_cosine(jnp.asarray(query), jnp.asarray(feats), k)
