"""Megatron-style tensor+sequence parallelism and GPipe pipeline parallelism
for the ImageBind ViT towers — one manual `shard_map` program composing
dp × pp × tp × sp.

The reference has no model parallelism at all (SURVEY.md §2.4); the ViT-H
tower fits on one chip, so these paths exist for scale-out beyond a single
chip's batch throughput and for the framework's training story:

  * tp (tensor): attention heads and MLP hidden split over "model"
    (same math as parallel/mesh.py's GSPMD rules, but explicit: the
    collectives are written, not inferred).
  * sp (sequence): BETWEEN blocks the residual stream is sharded over the
    TOKEN axis across "model" — LayerNorms and residual adds run on 1/mp of
    the tokens. `all_gather` (tokens) feeds attention/MLP; `psum_scatter`
    (tokens) replaces the plain psum a pure-TP block would need, so the
    per-chip activation footprint stays T/mp everywhere outside the matmuls.
  * pp (pipeline): block stack split into `pipe` stages; microbatches rotate
    stage-to-stage via `ppermute` on a GPipe schedule (M + S - 1 ticks).
  * dp (data): the microbatch axis shards over "data" as usual.

All of it is differentiable — `ppermute`/`all_gather`/`psum_scatter` have
transpose rules — so `train/contrastive.py` builds a dp×pp×tp×sp training
step directly on these functions (exercised by the driver's multichip dryrun
and tests/test_megatron.py on the virtual 8-device CPU mesh).

Layout note: the packed torch in_proj (3D, D) cannot be row-sharded directly
(rank 0 would get all of Q plus half of K); `tp_block_layout` re-packs it as
(3, D, D) so the head axis shards cleanly. Numerics match models/layers.py
block-for-block (fp32 parity tests at atol ~1e-5; psum_scatter changes only
summation order).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hippomm_tpu.models import layers as L
from hippomm_tpu.models.imagebind.model import (
    ImageBindConfig,
    vision_embed,
    vision_head,
)

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Layout: stacked blocks -> TP-shardable leaves (+ optional pipeline stages)
# ---------------------------------------------------------------------------


def tp_block_layout(blocks: Params) -> Params:
    """Stacked block params (leading (L,) axis, models/layers.py layout) ->
    a flat dict whose leaves shard cleanly over ("pipe", "model"):

      qkv_w (L, 3, D, D)   qkv_b (L, 3, D)     [head axis = dim 2]
      out_w (L, D, D)      out_b (L, D)        [in-dim sharded]
      fc1_w (L, H, D)      fc1_b (L, H)
      fc2_w (L, D, H)      fc2_b (L, D)
      ln1_w/b, ln2_w/b (L, D)
    """
    attn = blocks["attn"]
    if "bias_k" in attn:
        raise NotImplementedError("bias_kv blocks (audio tower) have no TP path")
    in_w = attn["in_proj"]["weight"]  # (L, 3D, D)
    depth, three_d, d = in_w.shape
    assert three_d == 3 * d
    out = {
        "qkv_w": in_w.reshape(depth, 3, d, d),
        "qkv_b": attn["in_proj"]["bias"].reshape(depth, 3, d),
        "out_w": attn["out_proj"]["weight"],
        "out_b": attn["out_proj"]["bias"],
        "fc1_w": blocks["mlp"]["fc1"]["weight"],
        "fc1_b": blocks["mlp"]["fc1"]["bias"],
        "fc2_w": blocks["mlp"]["fc2"]["weight"],
        "fc2_b": blocks["mlp"]["fc2"]["bias"],
        "ln1_w": blocks["norm_1"]["weight"],
        "ln1_b": blocks["norm_1"]["bias"],
        "ln2_w": blocks["norm_2"]["weight"],
        "ln2_b": blocks["norm_2"]["bias"],
    }
    return out


def add_stage_axis(packed: Params, stages: int) -> Params:
    """(L, ...) leaves -> (S, L/S, ...) for pipeline-stage sharding."""
    depth = packed["qkv_w"].shape[0]
    if depth % stages != 0:
        raise ValueError(f"depth {depth} not divisible by {stages} stages")
    return {k: v.reshape(stages, depth // stages, *v.shape[1:]) for k, v in packed.items()}


#: PartitionSpec tails per leaf (leading axes — stage and/or depth — prepended)
_TP_AXIS = {
    "qkv_w": (None, "model", None),
    "qkv_b": (None, "model"),
    "out_w": (None, "model"),
    "out_b": (None,),
    "fc1_w": ("model", None),
    "fc1_b": ("model",),
    "fc2_w": (None, "model"),
    "fc2_b": (None,),
    "ln1_w": (None,),
    "ln1_b": (None,),
    "ln2_w": (None,),
    "ln2_b": (None,),
}


def tp_specs(staged: bool) -> Dict[str, P]:
    """in_specs/placement specs for tp_block_layout leaves; staged adds the
    leading ("pipe",) stage axis before the depth axis."""
    lead = ("pipe", None) if staged else (None,)
    return {k: P(*(lead + tail)) for k, tail in _TP_AXIS.items()}


# ---------------------------------------------------------------------------
# The TP+SP block (runs INSIDE shard_map; all shapes are per-device locals)
# ---------------------------------------------------------------------------


def _ln(w: jax.Array, b: jax.Array, x: jax.Array, eps: float, out_dtype) -> jax.Array:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(out_dtype)


def tp_sp_block(
    pb: Params,
    x: jax.Array,
    heads_local: int,
    mask: Optional[jax.Array],
    eps: float,
    dtype,
) -> jax.Array:
    """One pre-LN encoder block, tokens sharded over "model" on entry/exit.

    x: (B, T/mp, D) local token shard of the residual stream (dtype).
    pb: per-block locals from tp_block_layout sharded per tp_specs —
    qkv (3, D/mp, D), out_w (D, D/mp), fc1 (H/mp, D), fc2 (D, H/mp).
    Matches models/layers.py encoder_block numerically (fp32 stats LN,
    bf16-matmul/fp32-accumulate, residual stream in `dtype`).
    """
    d_local = pb["qkv_w"].shape[1]
    hd = d_local // heads_local

    # ---- attention: LN on local tokens, gather tokens, local heads --------
    h = _ln(pb["ln1_w"], pb["ln1_b"], x, eps, dtype)
    h = jax.lax.all_gather(h, "model", axis=1, tiled=True)  # (B, T, D)

    def proj(i):  # (B, T, D) @ (D/mp, D)^T + b -> (B, T, D/mp)
        y = jnp.dot(h, pb["qkv_w"][i].T.astype(dtype), preferred_element_type=jnp.float32)
        return y + pb["qkv_b"][i].astype(jnp.float32)

    q, k, v = proj(0), proj(1), proj(2)
    bsz, t_full = q.shape[0], q.shape[1]

    def split(t):  # (B, T, D/mp) -> (B, Hl, T, hd)
        return t.reshape(bsz, t_full, heads_local, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(dtype), k.astype(dtype),
        preferred_element_type=jnp.float32,
    ) * (1.0 / np.sqrt(hd))
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(bsz, t_full, d_local)
    partial_o = jnp.dot(
        out.astype(dtype), pb["out_w"].T.astype(dtype), preferred_element_type=jnp.float32
    )  # (B, T, D) partial over head shards
    part = jax.lax.psum_scatter(partial_o, "model", scatter_dimension=1, tiled=True)
    x = x + (part + pb["out_b"].astype(jnp.float32)).astype(dtype)

    # ---- MLP: same gather/scatter pattern over the hidden split ------------
    h = _ln(pb["ln2_w"], pb["ln2_b"], x, eps, dtype)
    h = jax.lax.all_gather(h, "model", axis=1, tiled=True)
    h = jnp.dot(h.astype(dtype), pb["fc1_w"].T.astype(dtype), preferred_element_type=jnp.float32)
    h = L.gelu(h + pb["fc1_b"].astype(jnp.float32))
    partial_m = jnp.dot(h.astype(dtype), pb["fc2_w"].T.astype(dtype), preferred_element_type=jnp.float32)
    part = jax.lax.psum_scatter(partial_m, "model", scatter_dimension=1, tiled=True)
    return x + (part + pb["fc2_b"].astype(jnp.float32)).astype(dtype)


def _run_blocks(
    blocks_local: Params,
    x: jax.Array,
    heads_local: int,
    mask: Optional[jax.Array],
    eps: float,
    dtype,
    remat: bool,
) -> jax.Array:
    """lax.scan of tp_sp_block over the local (depth,) stacked leaves."""

    def body(h, pb):
        fn = tp_sp_block
        if remat:
            fn = jax.checkpoint(tp_sp_block, static_argnums=(2, 4, 5))
        return fn(pb, h, heads_local, mask, eps, dtype), None

    return jax.lax.scan(body, x.astype(dtype), blocks_local)[0]


# ---------------------------------------------------------------------------
# Token padding (the ViT token count — 257 for huge — is not divisible by mp)
# ---------------------------------------------------------------------------


def _padded_tokens(t: int, mp: int) -> int:
    return ((t + mp - 1) // mp) * mp


def _token_mask(t_valid: int, t_pad: int) -> Optional[jax.Array]:
    """Additive (1, 1, 1, T_pad) mask: pad KEY positions get -inf. Padded
    QUERY rows compute finite garbage that is sliced off after the stack."""
    if t_pad == t_valid:
        return None
    neg = jnp.where(jnp.arange(t_pad) < t_valid, 0.0, -jnp.inf).astype(jnp.float32)
    return neg.reshape(1, 1, 1, t_pad)


# ---------------------------------------------------------------------------
# SP+TP forward (no pipeline): shard_map over ("data", "model")
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "mesh", "dtype", "remat"))
def vision_forward_tp_sp(
    params: Dict,
    packed_blocks: Params,
    images: jax.Array,
    cfg: ImageBindConfig,
    mesh: Mesh,
    dtype=jnp.bfloat16,
    remat: bool = False,
) -> jax.Array:
    """ViT forward with tensor+sequence parallelism over `mesh`.

    params: the ordinary pytree (embed/head use it under GSPMD);
    packed_blocks: tp_block_layout(params["vision"]["blocks"]) placed with
    place_tp_params(staged=False). Output matches vision_forward (dtype=fp32
    exact up to psum_scatter summation order).
    """
    mp = mesh.shape["model"]
    heads = cfg.vision.heads
    if heads % mp != 0:
        raise ValueError(f"heads {heads} not divisible by model axis {mp}")

    x = vision_embed(params, images, cfg, dtype)  # (B, T, W) fp32
    t_valid = x.shape[1]
    t_pad = _padded_tokens(t_valid, mp)
    x = jnp.pad(x, ((0, 0), (0, t_pad - t_valid), (0, 0)))
    mask = _token_mask(t_valid, t_pad)

    specs = tp_specs(staged=False)

    def inner(pb, xt, m):
        return _run_blocks(pb, xt, heads // mp, m, cfg.vision.eps, dtype, remat)

    mask_spec = None if mask is None else P(None, None, None, None)
    x = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, P("data", "model", None), mask_spec),
        out_specs=P("data", "model", None),
    )(packed_blocks, x, mask)
    return vision_head(params, x[:, 0].astype(jnp.float32), cfg, dtype)


def place_tp_params(packed: Params, mesh: Mesh, staged: bool = False) -> Params:
    """device_put the packed block leaves per tp_specs on `mesh`."""
    specs = tp_specs(staged)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in packed.items()}


# ---------------------------------------------------------------------------
# GPipe pipeline: shard_map over ("data", "pipe", "model")
# ---------------------------------------------------------------------------


def pipeline_blocks(
    staged_blocks: Params,
    x: jax.Array,
    mesh: Mesh,
    heads: int,
    mask: Optional[jax.Array],
    eps: float,
    dtype,
    remat: bool = False,
) -> jax.Array:
    """Run the staged block stack as a GPipe pipeline.

    staged_blocks: (S, L/S, ...) leaves placed per tp_specs(staged=True).
    x: (M, mb, T_pad, D) microbatched token stream (fp32 or dtype).
    Schedule: M + S - 1 ticks; each tick every stage runs its L/S blocks on
    its current microbatch, then activations rotate one stage over "pipe"
    via ppermute. Stage 0 injects microbatch t; stage S-1 writes output
    t-(S-1). Differentiable end to end (ppermute transposes to the reverse
    rotation, so the backward pass is the mirrored pipeline).
    """
    stages = mesh.shape["pipe"]
    mp = mesh.shape["model"]
    heads_local = heads // mp
    n_micro = x.shape[0]
    perm = [(i, (i + 1) % stages) for i in range(stages)]

    def inner(pb_local, x_local, m):
        # pb_local leaves: (1, L/S, ...) -> (L/S, ...); x_local (M, mbl, Tl, D)
        pb_local = {k: v[0] for k, v in pb_local.items()}
        stage = jax.lax.axis_index("pipe")
        axes = ("data", "pipe", "model")
        # initial carries must carry the same varying-manual-axes type as the
        # loop outputs (zeros start out axis-invariant)
        state = jax.lax.pcast(jnp.zeros(x_local.shape[1:], dtype), axes, to="varying")
        out = jax.lax.pcast(jnp.zeros(x_local.shape, dtype), axes, to="varying")

        def tick(carry, t):
            state, out = carry
            inject = x_local[jnp.clip(t, 0, n_micro - 1)].astype(dtype)
            h = jnp.where(stage == 0, inject, state)
            h = _run_blocks(pb_local, h, heads_local, m, eps, dtype, remat)
            oi = jnp.clip(t - (stages - 1), 0, n_micro - 1)
            write = jnp.logical_and(stage == stages - 1, t >= stages - 1)
            out = out.at[oi].set(jnp.where(write, h, out[oi]))
            state = jax.lax.ppermute(h, "pipe", perm)
            return (state, out), None

        (state, out), _ = jax.lax.scan(
            tick, (state, out), jnp.arange(n_micro + stages - 1)
        )
        # replicate the last stage's outputs across "pipe" (zeros elsewhere)
        return jax.lax.psum(
            out * (stage == stages - 1).astype(out.dtype), "pipe"
        )

    specs = tp_specs(staged=True)
    mask_spec = None if mask is None else P(None, None, None, None)
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, P(None, "data", "model", None), mask_spec),
        out_specs=P(None, "data", "model", None),
    )(staged_blocks, x, mask)


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_micro", "dtype", "remat"))
def vision_forward_pp(
    params: Dict,
    staged_blocks: Params,
    images: jax.Array,
    cfg: ImageBindConfig,
    mesh: Mesh,
    n_micro: int = 2,
    dtype=jnp.bfloat16,
    remat: bool = False,
) -> jax.Array:
    """ViT forward as a dp×pp×tp×sp program on a ("data","pipe","model") mesh.

    staged_blocks: add_stage_axis(tp_block_layout(blocks), S) placed with
    place_tp_params(staged=True). Batch must split into n_micro microbatches
    each divisible by the data axis.
    """
    mp = mesh.shape["model"]
    b = images.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")

    x = vision_embed(params, images, cfg, dtype)  # (B, T, W) fp32
    t_valid = x.shape[1]
    t_pad = _padded_tokens(t_valid, mp)
    x = jnp.pad(x, ((0, 0), (0, t_pad - t_valid), (0, 0)))
    mask = _token_mask(t_valid, t_pad)
    x = x.reshape(n_micro, b // n_micro, t_pad, x.shape[-1])

    x = pipeline_blocks(
        staged_blocks, x, mesh, cfg.vision.heads, mask, cfg.vision.eps, dtype, remat
    )
    cls_tok = x.reshape(b, t_pad, -1)[:, 0].astype(jnp.float32)
    return vision_head(params, cls_tok, cfg, dtype)
