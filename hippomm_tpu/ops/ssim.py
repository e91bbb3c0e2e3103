"""Batched SSIM (structural similarity) on device.

Replaces skimage.metrics.structural_similarity as used by the reference for
key-framing (batch_process.py:32-71) and segmentation (hippocampal_memory.py:980-991)
— but batched: one compiled program scores ALL frame pairs of a video at once
instead of re-reading JPEGs from disk per pair.

Matches skimage defaults for 2-D uint8 grayscale: 7×7 uniform window, sample
covariance (N/(N-1)), C1=(0.01·L)², C2=(0.03·L)², mean over the valid (crop=3)
region. A VALID-window mean equals skimage's padded uniform_filter after its
interior crop, so results agree to fp32 tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from hippomm_tpu.utils.device import fetch

WIN = 7


def _window_mean(x: jax.Array) -> jax.Array:
    """(B, H, W) -> (B, H-6, W-6) mean over 7x7 VALID windows.

    Expressed as two separable 1-D convolutions (rows then cols) — compiles and
    runs far faster on TPU than a 2-D reduce_window (which lowered to a
    27-second compile at ingest shapes).

    precision=HIGHEST: TPU convs default to bf16 multiplies; x² window sums
    reach ~3e6 where bf16 rounding is O(100) per element, and the variance
    vx = cov(uxx − ux²) then cancels catastrophically — a bright STATIC frame
    pair could read SSIM ~0.5 instead of ~0.99, faking scene cuts. fp32
    sums keep the skimage-parity and host-mirror-equality claims true ON
    TPU, not just in the CPU test suite (same rule as similarity.py/mel.py).
    """
    ones_h = jnp.ones((1, 1, WIN, 1), jnp.float32)
    ones_w = jnp.ones((1, 1, 1, WIN), jnp.float32)
    y = x[:, None]  # (B, 1, H, W)
    y = jax.lax.conv_general_dilated(
        y, ones_h, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, ones_w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[:, 0] / (WIN * WIN)


def ssim_pairs_host(
    a: np.ndarray, b: np.ndarray, data_range: float = 255.0, dtype=np.float64
) -> np.ndarray:
    """numpy mirror of ssim_pairs for SMALL batches already on host (e.g. a
    handful of recall thumbnails): a device round trip costs ~60 ms of fixed
    transport latency where numpy finishes in ~1 ms. Same math, same 7x7
    valid-window means (cumsum-based).

    dtype=float64 matches skimage bit-for-bit (the parity oracle); the recall
    dedup gate (0.3 with wide margin) passes float32 — the cumsums are
    memory-bound and halve in wall time on the starved 1-core driver host."""

    def wmean(x):
        # valid 7x7 window means via 2-D cumulative sums
        c = np.cumsum(np.cumsum(x, axis=1), axis=2)
        c = np.pad(c, ((0, 0), (1, 0), (1, 0)))
        s = (
            c[:, WIN:, WIN:]
            - c[:, :-WIN, WIN:]
            - c[:, WIN:, :-WIN]
            + c[:, :-WIN, :-WIN]
        )
        return s / (WIN * WIN)

    x = np.asarray(a, dtype)
    y = np.asarray(b, dtype)
    np_ = WIN * WIN
    cov_norm = np_ / (np_ - 1.0)
    ux, uy = wmean(x), wmean(y)
    uxx, uyy, uxy = wmean(x * x), wmean(y * y), wmean(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return s.mean(axis=(1, 2)).astype(np.float32)


def ssim_one_to_many_host(
    ref: np.ndarray, batch: np.ndarray, data_range: float = 255.0,
    dtype=np.float32,
) -> np.ndarray:
    """SSIM of ONE reference image against (B, H, W) candidates, on host.

    Same math as ssim_pairs_host, but the reference's window statistics
    (mean, mean-of-squares) are computed ONCE and broadcast — the greedy
    keyframe walk scores every candidate against the same last-saved frame,
    and `ssim_pairs_host(np.repeat(ref, B), batch)` recomputed the identical
    ref cumsums B times (2/5 of the per-pair work) on top of materializing B
    copies of it. fp32 default: the DEVICE scan this mirrors runs fp32, and
    the host walk's job is matching ITS masks, not skimage's f64 bits."""

    def wmean(x):
        c = np.cumsum(np.cumsum(x, axis=-2, dtype=dtype), axis=-1, dtype=dtype)
        c = np.pad(c, [(0, 0)] * (c.ndim - 2) + [(1, 0), (1, 0)])
        s = (
            c[..., WIN:, WIN:]
            - c[..., :-WIN, WIN:]
            - c[..., WIN:, :-WIN]
            + c[..., :-WIN, :-WIN]
        )
        return s / (WIN * WIN)

    x = np.asarray(ref, dtype)  # (H, W)
    y = np.asarray(batch, dtype)  # (B, H, W)
    np_ = WIN * WIN
    cov_norm = np_ / (np_ - 1.0)
    ux = wmean(x)  # (h', w') — once
    uxx = wmean(x * x)
    uy = wmean(y)  # (B, h', w')
    uyy, uxy = wmean(y * y), wmean(x[None] * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux[None] * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux[None] * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx[None] + vy + c2)
    )
    return s.mean(axis=(1, 2)).astype(np.float32)


@partial(jax.jit, static_argnames=("data_range",))
def ssim_pairs(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """SSIM for B image pairs. a, b: (B, H, W) uint8/float. Returns (B,) fp32."""
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)
    np_ = WIN * WIN
    cov_norm = np_ / (np_ - 1.0)  # sample covariance, skimage default

    # ONE conv pipeline over the five stacked planes instead of five separate
    # ones (fewer XLA ops, smaller compiled program — this kernel's compile
    # time is load-bearing, see _window_mean)
    b = x.shape[0]
    planes = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
    m = _window_mean(planes)
    ux, uy, uxx, uyy, uxy = (m[i * b : (i + 1) * b] for i in range(5))

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(1, 2))


def batched_ssim(frames_a: np.ndarray, frames_b: np.ndarray, data_range: float = 255.0):
    """Host wrapper over (B, H, W) grayscale frame stacks -> np.ndarray (B,)."""
    a = np.asarray(frames_a)
    b = np.asarray(frames_b)
    if a.ndim == 2:
        a = a[None]
        b = b[None]
    return fetch(ssim_pairs(a, b, data_range=float(data_range)))


@partial(jax.jit, static_argnames=("data_range",))
def adjacent_ssim(frames: jax.Array, data_range: float = 255.0) -> jax.Array:
    """SSIM between consecutive frames of a (T, H, W) stack -> (T-1,).

    The segmentation front-end: one call scores every adjacent pair; boundary
    selection then runs on the tiny (T-1,) result (see memory/segmentation.py).
    """
    return ssim_pairs(frames[:-1], frames[1:], data_range=data_range)


def rgb_to_gray(frames: jax.Array) -> jax.Array:
    """ITU-R 601 luma, matching cv2.cvtColor(BGR2GRAY) coefficients on RGB input."""
    f = frames.astype(jnp.float32)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


@partial(jax.jit, static_argnames=("data_range",))
def frame_difference(a: jax.Array, b: jax.Array, data_range: float = 255.0) -> jax.Array:
    """1 - SSIM dissimilarity used for key-frame selection
    (reference: batch_process.py:32-71)."""
    return 1.0 - ssim_pairs(a, b, data_range=data_range)
