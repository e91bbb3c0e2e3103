"""Device mesh + sharding rules.

The reference has no distributed backend at all (SURVEY.md §2.4 — its
"parallelism" is mp.Pool/subprocess). Here the communication backend is JAX
collectives over ICI: a ("data", "model") mesh where

  * data  — batch axis: frames/segments/audio clips shard across chips
    (ingest is embarrassingly parallel over segments)
  * model — tensor-parallel axis for the ViT-H towers: attention heads and
    MLP hidden dims shard; XLA inserts the psum/all-gathers on ICI

Param shardings are rule-based over pytree paths, so the same rules drive
pjit for inference (engine) and training (train/contrastive.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    pipeline_parallel: int = 1,
    dcn_replicas: int = 1,
) -> Mesh:
    """("data", "model") mesh over the local devices — or, with
    pipeline_parallel > 1, a ("data", "pipe", "model") mesh for the GPipe
    path (parallel/megatron.py), or, with dcn_replicas > 1, a leading
    "replica" axis for multi-slice deployments.

    model_parallel (× pipeline_parallel × dcn_replicas) must divide the
    device count; data gets the rest. Axis order puts "model" innermost so
    tensor-parallel collectives ride the fastest ICI links, with pipe
    point-to-point (ppermute) on the next ring out, and "replica" OUTERMOST:
    jax.devices() orders multi-slice fleets slice-major, so the replica axis
    falls on slice boundaries and only pure data parallelism's collectives
    cross DCN: the gradient psum, plus — for losses coupling the global batch
    like InfoNCE — the embedding all-gather GSPMD inserts. TP/SP/pipe
    collectives stay inside a slice on ICI. Params replicate across it
    (param_shardings never names it), activations batch-shard over
    ("replica", "data") via data_sharding.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % (model_parallel * pipeline_parallel * dcn_replicas) != 0:
        raise ValueError(
            f"model_parallel={model_parallel} x pipeline_parallel="
            f"{pipeline_parallel} x dcn_replicas={dcn_replicas} "
            f"must divide device count {n}"
        )
    inner = n // dcn_replicas
    if pipeline_parallel > 1:
        shape = (inner // (model_parallel * pipeline_parallel),
                 pipeline_parallel, model_parallel)
        names = ("data", "pipe", "model")
    else:
        shape = (inner // model_parallel, model_parallel)
        names = ("data", "model")
    if dcn_replicas > 1:
        return Mesh(
            np.asarray(devs).reshape((dcn_replicas,) + shape),
            ("replica",) + names,
        )
    return Mesh(np.asarray(devs).reshape(shape), names)


# ---------------------------------------------------------------------------
# Parameter sharding rules (tensor parallelism of the transformer stacks)
# ---------------------------------------------------------------------------

# torch Linear convention W (out, in):
#   fc1 / in_proj / q,k,v: shard OUT dim  -> heads/hidden split across "model"
#   fc2 / out_proj:        shard IN dim   -> psum after the second matmul
# Stacked blocks carry a leading (depth,) axis → specs get a leading None.


def _spec_for(path: str, ndim: int, stacked: bool) -> P:
    lead = (None,) if stacked else ()

    def pad(spec_tail):
        full = lead + tuple(spec_tail)
        # pad/trim to ndim
        full = full[:ndim] + (None,) * max(0, ndim - len(full))
        return P(*full)

    if any(k in path for k in ("fc1", "in_proj", "q_proj", "k_proj", "v_proj")):
        if path.endswith("weight") and ndim >= (2 + (1 if stacked else 0)):
            return pad(("model", None))
        if path.endswith("bias"):
            return pad(("model",))
    if any(k in path for k in ("fc2", "out_proj")):
        if path.endswith("weight") and ndim >= (2 + (1 if stacked else 0)):
            return pad((None, "model"))
        if path.endswith("bias"):
            return pad((None,))
    # embeddings / norms / convs / heads: replicated
    return P(*((None,) * ndim))


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP rules above."""

    def one(path_entries, leaf):
        path = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_entries
        )
        stacked = ".blocks." in f".{path}."
        spec = _spec_for(path, np.ndim(leaf), stacked)
        # guard: axis size must divide the dimension; otherwise replicate
        dims = np.shape(leaf)
        for axis, name in enumerate(spec):
            if name == "model" and dims[axis] % mesh.shape["model"] != 0:
                spec = P(*((None,) * np.ndim(leaf)))
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def zero1_shardings(params, mesh: Mesh):
    """ZeRO-1 (optimizer-state sharding) specs: each tensor keeps its TP spec
    and additionally shards its first still-unsharded, divisible dim over
    "data" — so AdamW's mu/nu (2× params in fp32) split across the data axis
    instead of replicating. XLA's SPMD partitioner then materializes the
    classic ZeRO-1 schedule from the sharding constraints alone: the gradient
    psum becomes psum+slice (reduce_scatter) into the moment update, and
    optax.apply_updates' param add gathers the sharded update (all_gather) —
    no hand-written collectives. Deliberately NOT named on the "replica"
    (DCN) axis: sharding moments across slices would put an all-gather on
    DCN every step; moments replicate across slices and shard inside one.

    Memory: AdamW on ImageBind-Huge is ~8.6 GB of moments; on an 8-chip
    (data=4, model=2) v5e mesh, zero1 cuts the per-chip moment residency
    from ~4.3 GB (TP alone halves it) to ~1.1 GB.
    """
    dsize = mesh.shape["data"]
    base = param_shardings(params, mesh)

    def one(leaf, sh):
        dims = np.shape(leaf)
        spec = list(sh.spec) + [None] * (len(dims) - len(sh.spec))
        for i, d in enumerate(dims):
            if spec[i] is None and d % dsize == 0 and d >= dsize:
                spec[i] = "data"
                break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(one, params, base)


def _path_keys(path_entries) -> tuple:
    return tuple(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path_entries
    )


def zero1_opt_shardings(opt_state, params, mesh: Mesh):
    """Sharding tree for an optax opt_state mirroring `zero1_shardings`.

    optax states embed copies of the param pytree (ScaleByAdamState.mu/.nu),
    so each opt-state leaf is matched to its param by PATH TAIL: the leaf at
    `[0].mu.vision.blocks...` adopts the zero1 spec of param
    `vision.blocks...`; leaves with no param tail match (step counts,
    schedule scalars) replicate. Works for any optax chain without
    hard-coding its state structure.
    """
    z1 = zero1_shardings(params, mesh)
    flat, _ = jax.tree_util.tree_flatten_with_path(
        z1, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    by_tail = {_path_keys(path): sh for path, sh in flat}

    def one(path_entries, leaf):
        keys = _path_keys(path_entries)
        for start in range(len(keys)):
            sh = by_tail.get(keys[start:])
            if sh is not None and len(sh.spec) <= np.ndim(leaf):
                return sh
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, opt_state)


def data_axis_size(mesh: Mesh) -> int:
    """Total ways the batch axis splits under data_sharding — data × replica
    on a multi-slice mesh. Divisibility gates MUST use this, not
    mesh.shape["data"] alone (device_put raises on a non-divisible split)."""
    n = mesh.shape["data"]
    if "replica" in mesh.axis_names:
        n *= mesh.shape["replica"]
    return n


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-sharded activation: leading axis over "data" — and over
    ("replica", "data") on a multi-slice mesh, so each slice takes a batch
    slab and cross-slice traffic is limited to pure data parallelism's
    collectives (gradient psum — plus, for losses over the global batch like
    InfoNCE, the embedding all-gather GSPMD inserts)."""
    lead = ("replica", "data") if "replica" in mesh.axis_names else ("data",)
    return NamedSharding(mesh, P(*((lead,) + (None,) * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
