"""Fused frame resize + normalize: uint8 decoded frames -> ViT input tensors.

Replaces the reference's per-image PIL/torchvision transform chain inside
ImageBind.load_data (foundation_models.py:48-114) with one batched device program:
uint8 (B, H, W, 3) → bicubic-resized, CLIP-normalized (B, 3, S, S) in one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# CLIP / ImageBind vision normalization constants
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@partial(jax.jit, static_argnames=("size", "method", "antialias"))
def resize_normalize(
    frames: jax.Array,
    size: int = 224,
    method: str = "bicubic",
    antialias: bool = True,
) -> jax.Array:
    """uint8/float (B, H, W, 3) RGB -> normalized (B, 3, size, size) float32.

    torchvision semantics: Resize(size) scales the SHORT side to `size` with
    aspect preserved, then CenterCrop(size). We fuse both: resize so the short
    side hits `size` (static shapes — computed from the input's static H, W),
    center-crop, scale to [0,1], normalize with CLIP mean/std, and transpose to
    NCHW. One fused XLA program; the gather-based resize vectorizes on the VPU.
    """
    b, h, w, c = frames.shape
    x = frames.astype(jnp.float32) / 255.0
    # torchvision Resize computes the long side with int() TRUNCATION
    # (_compute_resized_output_size: int(size * long / short)) — round()
    # diverges by one pixel for 4:3-ish inputs (e.g. 320x240 -> 299 vs
    # torchvision's 298), shifting the whole resample grid vs the reference
    if h <= w:
        nh, nw = size, max(size, int(w * size / h))
    else:
        nh, nw = max(size, int(h * size / w)), size
    x = jax.image.resize(x, (b, nh, nw, c), method=method, antialias=antialias)
    top = (nh - size) // 2
    left = (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


@jax.jit
def normalize_nchw(crops_u8: jax.Array) -> jax.Array:
    """uint8 (B, S, S, 3) pre-resized crops -> CLIP-normalized (B, 3, S, S)
    fp32. Device half of the split preprocess: the resize+crop runs on HOST
    (`resize_crop_u8`) so only 224x224 uint8 crops cross the link — measured
    on the tunneled v5e transport, uploading raw 360x640 frames cost
    ~425 ms per 32-chunk (22 MB at ~50 MB/s) vs ~205 ms for the ViT-H forward
    itself, making ingest upload-bandwidth-bound (scripts/vision_dispatch_micro)."""
    x = crops_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


def _resize_dims(h: int, w: int, size: int):
    """torchvision Resize(short=size) dims — the long side TRUNCATES
    (int(size * long / short)); round() diverges by 1px on 4:3-ish inputs."""
    if h <= w:
        nh, nw = size, max(size, int(w * size / h))
    else:
        nh, nw = max(size, int(h * size / w)), size
    return nh, nw


def resize_crop_u8(frames, size: int = 224):
    """HOST-side preprocess: uint8 (B, H, W, 3) RGB -> uint8 (B, size,
    size, 3) resized short-side + center-cropped.

    This IS the reference's transform chain (PIL Resize(short=size, BICUBIC)
    -> CenterCrop(size), foundation_models.py:48-114) including PIL's uint8
    quantization of the resized image — closer to reference semantics than
    the fused fp32 device resize, at 4.6x fewer bytes over the host->device
    link (the ingest bottleneck on tunneled transports; see `normalize_nchw`).

    Runs through the C++ shim (`media_resize.cpp` — Pillow's exact 8bpc
    fixed-point resample, 3-channel direct, batch-threaded; bit-equal to PIL
    by test) when available, PIL per frame otherwise (~2.8 ms/frame/core).
    """
    import numpy as np

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames, 0, 255).astype(np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (B, H, W, 3) uint8, got {frames.shape}")
    n, h, w = frames.shape[:3]
    if n == 0:
        return np.empty((0, size, size, 3), np.uint8)
    nh, nw = _resize_dims(h, w, size)
    top, left = (nh - size) // 2, (nw - size) // 2

    from hippomm_tpu.media.io import resize_bicubic_crop_native

    out = resize_bicubic_crop_native(frames, nh, nw, top, left, size, size)
    if out is not None:
        return out

    from PIL import Image

    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        im = Image.fromarray(frames[i])
        if (nw, nh) != (w, h):
            im = im.resize((nw, nh), Image.BICUBIC)
        out[i] = np.asarray(im)[top : top + size, left : left + size]
    return out


@partial(jax.jit, static_argnames=("height", "width"))
def resize_frames(frames: jax.Array, height: int, width: int) -> jax.Array:
    """Plain bilinear uint8 frame resize (B, H, W, C) -> (B, height, width, C),
    used for SSIM downscaling and detailed-recall thumbnails
    (reference: hippocampal_memory.py:2210-2251 uses cv2.resize to 320×180)."""
    b, _, _, c = frames.shape
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (b, height, width, c), method="bilinear", antialias=True)
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
