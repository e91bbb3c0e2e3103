"""Audio silence detection on device.

Replaces (a) the reference's ffmpeg `silencedetect=n=-50dB:d=0.1` subprocess parse
(batch_process.py:298-318) and (b) the per-window Python RMS scan used during
segmentation (hippocampal_memory.py:993-1000, 1061-1077) with one windowed-RMS
reduction over the whole waveform.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from hippomm_tpu.utils.device import fetch

_DB_FLOOR = -100.0


def window_rms_db_bucketed(pcm: np.ndarray, window: int, hop: int) -> np.ndarray:
    """window_rms_db with the waveform length padded to a power of two, so the
    program compiles once per (bucket, window, hop) instead of once per audio
    duration. Zero padding yields floor-dB windows; the result is trimmed to
    the true window count so callers never see them."""
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    n = len(pcm)
    if n < window:
        return np.zeros((0,), np.float32)
    num = 1 + (n - window) // hop
    target = 1 << max(0, int(np.ceil(np.log2(max(n, window)))))
    if target > n:
        pcm = np.pad(pcm, (0, target - n))
    return fetch(window_rms_db(pcm, window, hop))[:num]


@partial(jax.jit, static_argnames=("window", "hop"))
def window_rms_db(pcm: jax.Array, window: int, hop: int) -> jax.Array:
    """RMS level in dBFS per window. pcm: (N,) float in [-1, 1].

    Returns (num_windows,) where num_windows = 1 + (N - window) // hop.
    """
    n = pcm.shape[0]
    num = 1 + (n - window) // hop
    x = pcm.astype(jnp.float32)
    sq = jnp.square(x)
    csum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sq)])
    starts = jnp.arange(num) * hop
    # fp32 cumsum differences can underflow slightly negative — clamp before sqrt
    sums = jnp.maximum(csum[starts + window] - csum[starts], 0.0)
    rms = jnp.sqrt(sums / window)
    db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))
    return jnp.maximum(db, _DB_FLOOR)


def detect_silence_regions(
    pcm: np.ndarray,
    sample_rate: int = 16000,
    threshold_db: float = -50.0,
    min_duration: float = 0.1,
    window_seconds: float = 0.05,
) -> List[Tuple[float, float]]:
    """ffmpeg-silencedetect equivalent: contiguous regions below threshold_db
    lasting >= min_duration. Returns [(start_s, end_s), ...].

    Device computes per-window dB in one reduction; the tiny boolean run-length
    pass runs on host.
    """
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    window = max(1, int(sample_rate * window_seconds))
    if pcm.shape[0] < window:
        db = 20.0 * np.log10(max(float(np.sqrt(np.mean(pcm**2) if pcm.size else 0.0)), 1e-10))
        if db < threshold_db and pcm.size / sample_rate >= min_duration:
            return [(0.0, pcm.size / sample_rate)]
        return []
    hop = window
    db = window_rms_db_bucketed(pcm, window, hop)
    silent = db < threshold_db
    regions: List[Tuple[float, float]] = []
    start = None
    for i, s in enumerate(silent):
        if s and start is None:
            start = i
        elif not s and start is not None:
            regions.append((start * hop / sample_rate, i * hop / sample_rate))
            start = None
    if start is not None:
        regions.append((start * hop / sample_rate, len(silent) * hop / sample_rate))
    return [(s, e) for (s, e) in regions if e - s >= min_duration]


def silence_fraction(
    pcm: np.ndarray, sample_rate: int = 16000, threshold_db: float = -50.0
) -> float:
    """Fraction of the waveform inside silence regions (the reference skips audio
    >90% silent, batch_process.py:321-327)."""
    dur = len(pcm) / sample_rate
    if dur <= 0:
        return 1.0
    regions = detect_silence_regions(pcm, sample_rate, threshold_db)
    return min(1.0, sum(e - s for s, e in regions) / dur)
