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
