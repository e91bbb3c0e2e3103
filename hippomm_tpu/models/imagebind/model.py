"""ImageBind joint-embedding model in JAX (vision / audio / text towers).

Re-implements the capability of the reference's ImageBind wrapper
(reference: hippomm/models/foundation_models.py:21-151 — torch.no_grad() forward
of ImageBind-Huge to a shared 1024-d space) as pure-function JAX towers under
jit/pjit. Architecture follows the public ImageBind design:

  * vision: ViT-H/14 — 2-frame repeated patchify Conv3d(2,14,14), width 1280,
    depth 32, heads 16, pre-LN blocks, CLS pooling, LN+Linear head → 1024
  * audio:  mel(128×204) → Conv2d k16 s10 patchify, ViT-B (768/12/12),
    CLS pooling, LN+Linear head → 1024, logit scale 20 (fixed)
  * text:   CLIP-style causal transformer, width 1024, depth 24, heads 16,
    context 77, EOS pooling, Linear head → 1024, learnable logit scale

All towers share `models/layers.py`; depth is a `lax.scan` over stacked block
params (one compiled block per tower — fast compiles at depth 32).

`hippomm_tpu.models.imagebind.convert` loads the public `imagebind_huge.pth`
into this pytree; `variant="tiny"` gives a hermetic random-init model with the
same topology for tests and stub-mode pipelines.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.models import layers as L

EMBED_DIM = 1024


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    width: int
    depth: int
    heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class ImageBindConfig:
    vision: TowerConfig = TowerConfig(width=1280, depth=32, heads=16)
    audio: TowerConfig = TowerConfig(width=768, depth=12, heads=12)
    text: TowerConfig = TowerConfig(width=1024, depth=24, heads=16)
    embed_dim: int = EMBED_DIM
    image_size: int = 224
    patch_size: int = 14
    audio_mel_bins: int = 128
    audio_target_len: int = 204
    audio_kernel: int = 16
    audio_stride: int = 10
    vocab_size: int = 49408
    context_length: int = 77
    audio_logit_scale: float = 20.0

    @property
    def vision_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def audio_tokens(self) -> int:
        h = (self.audio_mel_bins - self.audio_kernel) // self.audio_stride + 1
        w = (self.audio_target_len - self.audio_kernel) // self.audio_stride + 1
        return h * w + 1


def huge_config() -> ImageBindConfig:
    return ImageBindConfig()


def tiny_config() -> ImageBindConfig:
    """Same topology, tiny dims — hermetic tests + stub pipelines."""
    return ImageBindConfig(
        vision=TowerConfig(width=64, depth=2, heads=4),
        audio=TowerConfig(width=48, depth=2, heads=4),
        text=TowerConfig(width=64, depth=2, heads=4),
        image_size=56,
        patch_size=14,
        vocab_size=512,
        context_length=16,
    )


def get_config(variant: str) -> ImageBindConfig:
    if variant == "huge":
        return huge_config()
    if variant == "tiny":
        return tiny_config()
    raise ValueError(f"unknown imagebind variant: {variant}")


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def init_imagebind(key: jax.Array, cfg: ImageBindConfig) -> Dict:
    """Random init as ONE jitted device program — at ViT-H scale this is ~1B
    params; issuing per-leaf RNG ops would mean hundreds of separate dispatches
    (pathological over remote/tunneled device links)."""
    kv, ka, kt = jax.random.split(key, 3)
    params: Dict = {}

    # vision tower
    kv1, kv2, kv3, kv4 = jax.random.split(kv, 4)
    vw = cfg.vision.width
    params["vision"] = {
        "patch_conv": {  # Conv3d (out, in, T=2, ph, pw), bias-free
            "weight": 0.02
            * jax.random.normal(kv1, (vw, 3, 2, cfg.patch_size, cfg.patch_size), jnp.float32)
        },
        "cls_token": jnp.zeros((1, 1, vw), jnp.float32),
        "pos_embed": 0.02 * jax.random.normal(kv2, (1, cfg.vision_tokens, vw), jnp.float32),
        "pre_ln": L.init_layer_norm(vw),
        "blocks": L.stack_block_params(
            [
                L.init_block(k, vw, cfg.vision.mlp_ratio)
                for k in jax.random.split(kv3, cfg.vision.depth)
            ]
        ),
        "head_ln": L.init_layer_norm(vw),
        "head_proj": {"weight": 0.02 * jax.random.normal(kv4, (cfg.embed_dim, vw), jnp.float32)},
    }

    # audio tower
    ka1, ka2, ka3, ka4 = jax.random.split(ka, 4)
    aw = cfg.audio.width
    params["audio"] = {
        "patch_conv": {
            "weight": 0.02
            * jax.random.normal(ka1, (aw, 1, cfg.audio_kernel, cfg.audio_kernel), jnp.float32)
        },
        "patch_norm": L.init_layer_norm(aw),
        "cls_token": jnp.zeros((1, 1, aw), jnp.float32),
        "pos_embed": 0.02 * jax.random.normal(ka2, (1, cfg.audio_tokens, aw), jnp.float32),
        "blocks": L.stack_block_params(
            [
                # the public audio trunk uses add_bias_kv=True (imagebind_model)
                L.init_block(k, aw, cfg.audio.mlp_ratio, bias_kv=True)
                for k in jax.random.split(ka3, cfg.audio.depth)
            ]
        ),
        "head_ln": L.init_layer_norm(aw),
        "head_proj": {"weight": 0.02 * jax.random.normal(ka4, (cfg.embed_dim, aw), jnp.float32)},
    }

    # text tower
    kt1, kt2, kt3, kt4 = jax.random.split(kt, 4)
    tw = cfg.text.width
    params["text"] = {
        "token_embedding": 0.02 * jax.random.normal(kt1, (cfg.vocab_size, tw), jnp.float32),
        "pos_embed": 0.01 * jax.random.normal(kt2, (1, cfg.context_length, tw), jnp.float32),
        "blocks": L.stack_block_params(
            [
                L.init_block(k, tw, cfg.text.mlp_ratio)
                for k in jax.random.split(kt3, cfg.text.depth)
            ]
        ),
        "final_ln": L.init_layer_norm(tw),
        "head_proj": {"weight": 0.02 * jax.random.normal(kt4, (cfg.embed_dim, tw), jnp.float32)},
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    return params


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _l2norm(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def vision_embed(
    params: Dict, images: jax.Array, cfg: ImageBindConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """Patchify + CLS + pos-embed + pre-LN: (B, 3, S, S) -> (B, N, W) fp32.

    ImageBind pads images to a 2-frame clip (repeat) before the Conv3d
    patchify; with stride T=2 that collapses back to one temporal slot, so the
    Conv3d is equivalent to a Conv2d with kernel = sum over the T axis. We
    exploit that: one 2-D convolution on the MXU.
    """
    p = params["vision"]
    # (out, in, 2, ph, pw) -> summed temporal kernel (out, in, ph, pw)
    w = p["patch_conv"]["weight"].sum(axis=2).astype(dtype)
    # NHWC output: token dim lands OUTSIDE the feature dim, so (B, N, W) is a
    # free reshape — the NCHW layout needed a (B, W, N)→(B, N, W) transpose of
    # the fp32 conv output (168 MB at ViT-H b128) that moved zero FLOPs.
    # Same convolution, identical values.
    x = jax.lax.conv_general_dilated(
        images.astype(dtype),
        w,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (B, H/p, W/p, W)
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.vision.width)  # (B, N, W)
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.vision.width)).astype(jnp.float32)
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(jnp.float32)
    return L.layer_norm(p["pre_ln"], x, cfg.vision.eps)


def vision_head(
    params: Dict, cls_tok: jax.Array, cfg: ImageBindConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """Final LN + projection on the CLS token: (B, W) -> (B, 1024) unit-norm."""
    p = params["vision"]
    x = L.layer_norm(p["head_ln"], cls_tok, cfg.vision.eps)
    x = jnp.dot(x.astype(dtype), p["head_proj"]["weight"].T.astype(dtype), preferred_element_type=jnp.float32)
    return _l2norm(x)


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def vision_forward(
    params: Dict, images: jax.Array, cfg: ImageBindConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """images: (B, 3, S, S) normalized fp32 -> (B, 1024) L2-normalized."""
    p = params["vision"]
    x = vision_embed(params, images, cfg, dtype)
    x = L.stacked_blocks(p["blocks"], x, cfg.vision.heads, eps=cfg.vision.eps, dtype=dtype)
    return vision_head(params, x[:, 0], cfg, dtype)


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def audio_forward(
    params: Dict, mel: jax.Array, cfg: ImageBindConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """mel: (B, 1, 128, 204) normalized fbank -> (B, 1024) L2-normalized ×20.

    Multi-clip inputs (B, C, 1, 128, 204) are averaged after embedding, like
    ImageBind's clip ensembling.
    """
    multi_clip = mel.ndim == 5
    if multi_clip:
        b_, c_ = mel.shape[:2]
        mel = mel.reshape(b_ * c_, *mel.shape[2:])
    p = params["audio"]
    # NHWC output for the same transpose-free (B, N, W) reshape as the vision
    # patchify (token order — row-major over the patch grid — is unchanged)
    x = jax.lax.conv_general_dilated(
        mel.astype(dtype),
        p["patch_conv"]["weight"].astype(dtype),
        window_strides=(cfg.audio_stride, cfg.audio_stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.audio.width)
    x = L.layer_norm(p["patch_norm"], x, cfg.audio.eps)
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.audio.width)).astype(jnp.float32)
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(jnp.float32)
    x = L.stacked_blocks(p["blocks"], x, cfg.audio.heads, eps=cfg.audio.eps, dtype=dtype)
    x = L.layer_norm(p["head_ln"], x[:, 0], cfg.audio.eps)
    x = jnp.dot(x.astype(dtype), p["head_proj"]["weight"].T.astype(dtype), preferred_element_type=jnp.float32)
    x = _l2norm(x) * cfg.audio_logit_scale
    if multi_clip:
        x = x.reshape(b_, c_, -1).mean(axis=1)
    return x


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def text_forward(
    params: Dict, tokens: jax.Array, cfg: ImageBindConfig, dtype=jnp.bfloat16
) -> jax.Array:
    """tokens: (B, context) int32, 0-padded after EOS -> (B, 1024) L2-normalized.

    EOS pooling follows CLIP: take the position of the per-row max token id
    (EOS has the largest id in the CLIP vocab).
    """
    p = params["text"]
    b, t = tokens.shape
    x = p["token_embedding"][tokens].astype(jnp.float32) + p["pos_embed"][:, :t].astype(jnp.float32)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    x = L.stacked_blocks(p["blocks"], x, cfg.text.heads, mask=causal, eps=cfg.text.eps, dtype=dtype)
    x = L.layer_norm(p["final_ln"], x, cfg.text.eps)
    eos = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(b), eos]
    x = jnp.dot(x.astype(dtype), p["head_proj"]["weight"].T.astype(dtype), preferred_element_type=jnp.float32)
    x = _l2norm(x)
    return x * jnp.exp(p["logit_scale"])


def extract_features(
    params: Dict,
    cfg: ImageBindConfig,
    vision: Optional[jax.Array] = None,
    audio: Optional[jax.Array] = None,
    text: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
) -> Dict[str, jax.Array]:
    """Joint forward over any subset of modalities → {modality: (N, 1024)}.

    Mirrors the reference surface ImageBind.extract_features
    (foundation_models.py:135-151)."""
    out = {}
    if vision is not None:
        out["vision"] = vision_forward(params, vision, cfg, dtype)
    if audio is not None:
        out["audio"] = audio_forward(params, audio, cfg, dtype)
    if text is not None:
        out["text"] = text_forward(params, text, cfg, dtype)
    return out
