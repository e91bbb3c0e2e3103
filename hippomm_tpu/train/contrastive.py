"""ImageBind-style contrastive fine-tuning under pjit.

The reference is inference-only, but its embedding space comes from exactly
this objective (InfoNCE between modality pairs). Providing the training step
makes the framework self-sufficient: embeddings can be adapted to a domain
(e.g. fine-tune vision↔text on captioned key frames from the memory store).

Sharding: batch over "data", tower params tensor-parallel over "model"
(parallel/mesh.py rules); jit over the mesh inserts the ICI collectives
(gradient psum over data, activation collectives for TP) automatically.
`jax.checkpoint` on the block scan bounds memory at ViT-H depth.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hippomm_tpu.models.imagebind.model import (
    ImageBindConfig,
    init_imagebind,
    text_forward,
    vision_forward,
)
from hippomm_tpu.parallel.mesh import data_sharding, param_shardings, replicated


def contrastive_loss(
    params: Dict,
    images: jax.Array,
    tokens: jax.Array,
    cfg: ImageBindConfig,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict]:
    """Symmetric InfoNCE between vision and text embeddings.

    images (B, 3, S, S), tokens (B, T). Embeddings are already L2-normalized
    (and text is scaled by the learnable logit scale) by the towers.
    """
    v = vision_forward(params, images, cfg, dtype)  # (B, D), unit norm
    t = text_forward(params, tokens, cfg, dtype)  # (B, D), scaled
    logits = jnp.dot(v, t.T, preferred_element_type=jnp.float32)  # (B, B)
    labels = jnp.arange(logits.shape[0])
    loss_v2t = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_t2v = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    loss = 0.5 * (loss_v2t + loss_t2v)
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"loss": loss, "accuracy": acc}


def init_train_state(
    key: jax.Array,
    cfg: ImageBindConfig,
    mesh,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
    zero1: bool = False,
):
    """(params, opt_state, tx, shardings) with params placed per the TP
    sharding rules. With zero1=True, AdamW's moments are additionally
    sharded over the "data" axis (ZeRO-1; parallel/mesh.zero1_shardings) —
    pass make_train_step(opt_shardings=zero1_opt_shardings(...)) to pin the
    step's opt-state placement to match."""
    params = init_imagebind(key, cfg)
    shardings = param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)
    if zero1:
        from hippomm_tpu.parallel.mesh import zero1_opt_shardings

        opt_state = jax.device_put(
            opt_state, zero1_opt_shardings(opt_state, params, mesh)
        )
    return params, opt_state, tx, shardings


def init_train_state_pp(
    key: jax.Array,
    cfg: ImageBindConfig,
    mesh,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
):
    """Train state for the dp×pp×tp×sp step on a ("data","pipe","model") mesh.

    The vision block stack moves into the pipeline layout
    (parallel/megatron.py: (S, L/S, ...) leaves, qkv split for head-sharding)
    and is stage-sharded over "pipe" / head-sharded over "model"; everything
    else (patchify, heads, text tower) keeps the GSPMD TP rules. Returns
    (state_params, opt_state, tx, shardings) where state_params =
    {"base": params-without-vision-blocks, "blocks": staged pipeline leaves}.
    """
    from hippomm_tpu.parallel.megatron import (
        add_stage_axis,
        place_tp_params,
        tp_block_layout,
    )

    params = init_imagebind(key, cfg)
    staged = add_stage_axis(
        tp_block_layout(params["vision"]["blocks"]), mesh.shape["pipe"]
    )
    staged = place_tp_params(staged, mesh, staged=True)
    base = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    del base["vision"]["blocks"]
    base_sh = param_shardings(base, mesh)
    base = jax.device_put(base, base_sh)
    state_params = {"base": base, "blocks": staged}
    shardings = {
        "base": base_sh,
        "blocks": jax.tree.map(lambda x: x.sharding, staged),
    }
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(state_params)
    return state_params, opt_state, tx, shardings


def make_train_step_pp(
    cfg: ImageBindConfig,
    mesh,
    tx,
    shardings,
    n_micro: int = 2,
    dtype=jnp.bfloat16,
    remat: bool = False,
):
    """Contrastive train step where the vision tower runs as a GPipe pipeline
    (dp × pp × tp × sp, parallel/megatron.py) and the text tower under GSPMD
    TP. Differentiates straight through ppermute/all_gather/psum_scatter."""
    from hippomm_tpu.parallel.megatron import vision_forward_pp

    def loss_fn(sp, images, tokens):
        v = vision_forward_pp(
            sp["base"], sp["blocks"], images, cfg, mesh,
            n_micro=n_micro, dtype=dtype, remat=remat,
        )
        t = text_forward(sp["base"], tokens, cfg, dtype)
        logits = jnp.dot(v, t.T, preferred_element_type=jnp.float32)
        labels = jnp.arange(logits.shape[0])
        loss_v2t = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        loss_t2v = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        loss = 0.5 * (loss_v2t + loss_t2v)
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return loss, {"loss": loss, "accuracy": acc}

    def step(sp, opt_state, images, tokens):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            sp, images, tokens
        )
        updates, opt_state = tx.update(grads, opt_state, sp)
        sp = optax.apply_updates(sp, updates)
        return sp, opt_state, metrics

    return jax.jit(
        step,
        in_shardings=(shardings, None, data_sharding(mesh, 4), data_sharding(mesh, 2)),
        out_shardings=(shardings, None, None),
        donate_argnums=(0, 1),
    )


def init_moe_adapter_state(
    key: jax.Array,
    cfg: ImageBindConfig,
    mesh,
    n_experts: int,
    hidden: Optional[int] = None,
    learning_rate: float = 1e-4,
):
    """Train state for the expert-parallel adapter (parallel/moe.py): a
    residual Switch-MoE FFN over the FROZEN towers' embeddings — capacity
    scales with experts (sharded over "model") while per-chip FLOPs/memory
    stay constant. Returns (moe_params, opt_state, tx)."""
    from hippomm_tpu.parallel.moe import init_moe_params, place_moe_params

    d = cfg.embed_dim
    moe = place_moe_params(
        init_moe_params(key, d, hidden or 2 * d, n_experts), mesh
    )
    tx = optax.adamw(learning_rate)
    return moe, tx.init(moe), tx


def make_train_step_moe(
    frozen_params: Dict,
    cfg: ImageBindConfig,
    mesh,
    tx,
    balance_coef: float = 0.01,
    dtype=jnp.bfloat16,
):
    """Contrastive train step for the MoE adapter: towers run frozen
    (no tower grads), vision embeddings pass through the residual
    expert-parallel FFN, and only the adapter trains (dp × ep).

    Each embedding is one routing token; the (B, D) batch reshapes to
    (B/mp, mp, D) so tokens partition across the WHOLE mesh (batch over
    "data", the mp-token axis over "model" — no duplicated routing work).
    Requires B % (dp·mp) == 0. The Switch load-balance aux joins the loss.
    """
    from hippomm_tpu.parallel.moe import moe_block

    mp = mesh.shape["model"]

    def loss_fn(moe_params, frozen, images, tokens):
        v = jax.lax.stop_gradient(vision_forward(frozen, images, cfg, dtype))
        t = jax.lax.stop_gradient(text_forward(frozen, tokens, cfg, dtype))
        b, d = v.shape
        x = v.reshape(b // mp, mp, d)
        y, aux = moe_block(moe_params, x, mesh, dtype=dtype)
        v2 = v + y.reshape(b, d)
        v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-8)
        logits = jnp.dot(v2, t.T, preferred_element_type=jnp.float32)
        labels = jnp.arange(logits.shape[0])
        loss_v2t = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        loss_t2v = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        loss = 0.5 * (loss_v2t + loss_t2v) + balance_coef * aux
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return loss, {"loss": loss, "accuracy": acc, "balance": aux}

    def step(moe_params, frozen, opt_state, images, tokens):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            moe_params, frozen, images, tokens
        )
        updates, opt_state = tx.update(grads, opt_state, moe_params)
        moe_params = optax.apply_updates(moe_params, updates)
        return moe_params, opt_state, metrics

    # the frozen towers are a traced ARGUMENT, not a closure constant —
    # closing over them would bake ~630M params into the jaxpr at ViT-H
    # scale (untracked by in_shardings, duplicated into the executable)
    jitted = jax.jit(
        step,
        in_shardings=(
            None, None, None, data_sharding(mesh, 4), data_sharding(mesh, 2)
        ),
        donate_argnums=(0, 2),
    )

    def run(moe_params, opt_state, images, tokens):
        return jitted(moe_params, frozen_params, opt_state, images, tokens)

    return run


def make_train_step(cfg: ImageBindConfig, mesh, tx, shardings, dtype=jnp.bfloat16,
                    opt_shardings=None):
    """Jitted pjit train step: (params, opt_state, images, tokens) → updated.

    opt_shardings (from parallel/mesh.zero1_opt_shardings) pins the opt state
    to its ZeRO-1 placement in AND out, so XLA lowers the moment update as a
    reduce_scatter of the gradient and apply_updates as an all_gather of the
    sharded update — without it the moments follow the input placement
    (replicated over "data" when init_train_state ran with zero1=False)."""

    def step(params, opt_state, images, tokens):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: contrastive_loss(p, images, tokens, cfg, dtype), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    # None: opt-state shardings follow the input placement (jit infers them)
    return jax.jit(
        step,
        in_shardings=(shardings, opt_shardings, data_sharding(mesh, 4),
                      data_sharding(mesh, 2)),
        out_shardings=(shardings, opt_shardings, None),
        donate_argnums=(0, 1),
    )
