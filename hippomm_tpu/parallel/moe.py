"""Expert parallelism (ep): a Switch-style top-1 mixture-of-experts FFN whose
experts shard over the mesh's "model" axis, completing the framework's
dp/pp/tp/sp/ep parallel layer.

The reference has no MoE anywhere in its model surface (SURVEY.md §2.4 — it
has no distributed backend at all), so this layer exists for the framework's
scale-out training story, like parallel/megatron.py: an adapter FFN trained
on top of frozen tower embeddings can be widened via experts without growing
per-chip memory or FLOPs.

The program is the canonical TPU MoE (GShard/Switch):

  * routing — each device routes its LOCAL token shard (tokens shard over
    "data" on batch and over "model" on sequence, sp-style) with a replicated
    router matmul; top-1 expert per token, fixed per-expert capacity C.
  * dispatch — a (T, E, C) one-hot dispatch tensor turns gather/scatter into
    two einsums (MXU-friendly; no dynamic shapes, so XLA tiles them), giving
    (E, C, D) expert slots.
  * all_to_all over "model" — slots travel to the device owning each expert:
    (E, C, D) -> (E/mp, mp·C, D). The same collective transposed brings
    results home. all_to_all has a transpose rule, so the whole layer is
    differentiable end to end.
  * expert FFN — one batched einsum pair over the device's local experts
    (bf16 matmuls, fp32 accumulation — house numerics).
  * combine — the dispatch tensor weighted by the (differentiable) gate
    value recovers (T, D); dropped tokens (capacity overflow) contribute
    zero, so callers use the standard residual form  x + moe(x).

The Switch load-balance auxiliary loss is computed from globally pmean-ed
routing statistics, replicated across the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hippomm_tpu.models import layers as L

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_moe_params(key: jax.Array, d: int, hidden: int, n_experts: int) -> Params:
    """Router (replicated) + expert FFN stacks (leading (E,) axis, sharded).

    Expert weights use the torch Linear (out, in) convention like
    models/layers.py so the einsums below read identically to the dense MLP.
    """
    kr, k1, k2 = jax.random.split(key, 3)
    scale1 = 1.0 / np.sqrt(d)
    scale2 = 1.0 / np.sqrt(hidden)
    return {
        "router_w": (0.02 * jax.random.normal(kr, (d, n_experts), jnp.float32)),
        "fc1_w": scale1 * jax.random.normal(k1, (n_experts, hidden, d), jnp.float32),
        "fc1_b": jnp.zeros((n_experts, hidden), jnp.float32),
        "fc2_w": scale2 * jax.random.normal(k2, (n_experts, d, hidden), jnp.float32),
        "fc2_b": jnp.zeros((n_experts, d), jnp.float32),
    }


#: PartitionSpecs: experts shard over "model"; the router is replicated.
_MOE_SPECS = {
    "router_w": P(None, None),
    "fc1_w": P("model", None, None),
    "fc1_b": P("model", None),
    "fc2_w": P("model", None, None),
    "fc2_b": P("model", None),
}


def moe_specs() -> Dict[str, P]:
    return dict(_MOE_SPECS)


def place_moe_params(params: Params, mesh: Mesh) -> Params:
    return {
        k: jax.device_put(v, NamedSharding(mesh, _MOE_SPECS[k]))
        for k, v in params.items()
    }


# ---------------------------------------------------------------------------
# The expert-parallel program (runs INSIDE shard_map; shapes are locals)
# ---------------------------------------------------------------------------


def _moe_local(
    p: Params,
    x: jax.Array,
    n_experts: int,
    capacity: int,
    dtype,
) -> Tuple[jax.Array, jax.Array]:
    """x: (Tl, D) local token shard. p: router replicated, expert leaves
    (E/mp, ...) local. Returns (y (Tl, D) fp32, aux scalar replicated)."""
    mp = jax.lax.axis_size("model")
    e_local = p["fc1_w"].shape[0]
    assert e_local * mp == n_experts

    # ---- top-1 routing (fp32) ----------------------------------------------
    logits = jnp.dot(x.astype(jnp.float32), p["router_w"])  # (Tl, E)
    gates = jax.nn.softmax(logits, axis=-1)
    eidx = jnp.argmax(gates, axis=-1)  # (Tl,)
    gate = jnp.take_along_axis(gates, eidx[:, None], axis=-1)[:, 0]  # (Tl,)
    onehot = jax.nn.one_hot(eidx, n_experts, dtype=jnp.float32)  # (Tl, E)

    # position of each token within its expert's capacity slots
    pos = jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=-1) - 1.0  # (Tl,)
    keep = pos < capacity
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=jnp.float32)
    dispatch = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]  # (T,E,C)
    combine = dispatch * gate[:, None, None]

    # ---- load-balance aux (Switch eq. 4) over GLOBAL statistics ------------
    frac = jax.lax.pmean(jnp.mean(onehot, axis=0), ("data", "model"))
    prob = jax.lax.pmean(jnp.mean(gates, axis=0), ("data", "model"))
    aux = n_experts * jnp.sum(frac * prob)

    # ---- dispatch: (Tl,D) -> (E,C,D) -> a2a -> (E/mp, mp*C, D) -------------
    slots = jnp.einsum(
        "td,tec->ecd", x.astype(dtype), dispatch.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    slots = jax.lax.all_to_all(slots, "model", split_axis=0, concat_axis=1, tiled=True)

    # ---- expert FFN (bf16 matmul / fp32 accumulate) -------------------------
    h = jnp.einsum(
        "ecd,ehd->ech", slots, p["fc1_w"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    h = L.gelu(h + p["fc1_b"][:, None, :].astype(jnp.float32)).astype(dtype)
    y = jnp.einsum(
        "ech,edh->ecd", h, p["fc2_w"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    # the bias applies per LANDED slot; empty slots must stay zero so they
    # vanish in the combine — mask by slot occupancy
    occupied = jnp.einsum("tec->ec", dispatch)  # (E, C) 0/1
    occupied = jax.lax.all_to_all(
        occupied, "model", split_axis=0, concat_axis=1, tiled=True
    )
    y = (y + p["fc2_b"][:, None, :]) * occupied[:, :, None]

    # ---- return home + weighted combine -------------------------------------
    y = jax.lax.all_to_all(
        y.astype(dtype), "model", split_axis=1, concat_axis=0, tiled=True
    )  # (E, C, D)
    out = jnp.einsum(
        "ecd,tec->td", y, combine.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out, aux


# ---------------------------------------------------------------------------
# Public jitted wrapper: dp over batch, sp over tokens, ep over "model"
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh", "capacity_factor", "dtype"))
def moe_block(
    params: Params,
    x: jax.Array,
    mesh: Mesh,
    capacity_factor: float = 1.25,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel MoE FFN over a ("data", "model") mesh.

    x: (B, T, D) — batch shards over "data", tokens over "model" (sp-style,
    so routing/LN-free work also splits). B % data, T % model, and
    n_experts % model must all be 0. Returns (y (B, T, D) fp32, aux scalar).
    Callers use the residual form  x + moe_block(...)[0].
    """
    n_experts = params["router_w"].shape[1]
    mp = mesh.shape["model"]
    dp = mesh.shape["data"]
    b, t, d = x.shape
    if n_experts % mp != 0:
        raise ValueError(f"n_experts {n_experts} not divisible by model axis {mp}")
    if b % dp != 0 or t % mp != 0:
        raise ValueError(f"batch {b} / tokens {t} must divide mesh {dp}x{mp}")
    tokens_local = (b // dp) * (t // mp)
    capacity = int(np.ceil(capacity_factor * tokens_local / n_experts))

    def inner(p, xt):
        xt_flat = xt.reshape(-1, d)
        y, aux = _moe_local(p, xt_flat, n_experts, capacity, dtype)
        return y.reshape(xt.shape), aux

    y, aux = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(moe_specs(), P("data", "model", None)),
        out_specs=(P("data", "model", None), P()),
    )(params, x)
    return y, aux


# ---------------------------------------------------------------------------
# Single-device oracle (tests): identical math, no collectives
# ---------------------------------------------------------------------------


def moe_reference(
    params: Params, x: jax.Array, capacity_factor: float = 1.25
) -> Tuple[jax.Array, jax.Array]:
    """Dense-math oracle of moe_block at mesh=(1,1): routes ALL tokens in one
    group with the same per-group capacity as one device of a (dp, mp) mesh
    would see — callers matching a sharded run must pass x pre-split into the
    same (device-local) token groups and concatenate."""
    b, t, d = x.shape
    xf = x.reshape(-1, d).astype(jnp.float32)
    n_experts = params["router_w"].shape[1]
    capacity = int(np.ceil(capacity_factor * xf.shape[0] / n_experts))
    logits = xf @ params["router_w"]
    gates = jax.nn.softmax(logits, axis=-1)
    eidx = jnp.argmax(gates, axis=-1)
    gate = jnp.take_along_axis(gates, eidx[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(eidx, n_experts, dtype=jnp.float32)
    pos = jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=-1) - 1.0
    keep = pos < capacity
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=jnp.float32)
    dispatch = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
    combine = dispatch * gate[:, None, None]
    slots = jnp.einsum("td,tec->ecd", xf, dispatch)
    h = L.gelu(
        jnp.einsum("ecd,ehd->ech", slots, params["fc1_w"])
        + params["fc1_b"][:, None, :]
    )
    y = jnp.einsum("ech,edh->ecd", h, params["fc2_w"])
    occupied = jnp.einsum("tec->ec", dispatch)
    y = (y + params["fc2_b"][:, None, :]) * occupied[:, :, None]
    out = jnp.einsum("ecd,tec->td", y, combine)
    frac = jnp.mean(onehot, axis=0)
    prob = jnp.mean(gates, axis=0)
    aux = n_experts * jnp.sum(frac * prob)
    return out.reshape(b, t, d), aux
