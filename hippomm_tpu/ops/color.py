"""On-device color conversion (BT.601 full-range).

TPU-first decode path: the host ships planar YUV420 (1.5 B/px) and the chroma
upsample + matrix conversion runs as one fused elementwise program on the VPU —
half the host→device bandwidth of shipping RGB, and zero host CPU spent on
conversion (the reference pays cv2.cvtColor per frame on CPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Planar YUV420 (full-range BT.601) -> (N, H, W, 3) uint8 RGB.

    y: (N, H, W) uint8; u, v: (N, H/2, W/2) uint8.
    """
    yf = y.astype(jnp.float32)
    # nearest-neighbor chroma upsample (matches our 2x2-mean downsample inverse)
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32), 2, axis=1), 2, axis=2) - 128.0
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32), 2, axis=1), 2, axis=2) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


@jax.jit
def rgb_to_yuv420(rgb: jax.Array):
    """(N, H, W, 3) uint8 RGB -> planar YUV420 (full-range BT.601).

    Chroma is 2x2 box-downsampled. Returns (y, u, v) uint8.
    """
    f = rgb.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def down2(x):
        n, h, w = x.shape
        return x.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    to_u8 = lambda x: jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    return to_u8(y), to_u8(down2(u)), to_u8(down2(v))
