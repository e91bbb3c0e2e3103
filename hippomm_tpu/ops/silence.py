"""Audio silence detection.

Replaces (a) the reference's ffmpeg `silencedetect=n=-50dB:d=0.1` subprocess parse
(batch_process.py:298-318) and (b) the per-window Python RMS scan used during
segmentation (hippocampal_memory.py:993-1000, 1061-1077) with one windowed-RMS
reduction over the whole waveform. The reduction is memory-bound with ~0
FLOPs/byte, so for host-resident audio it runs in numpy (window_rms_db_host);
the jitted window_rms_db serves device-resident waveforms.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DB_FLOOR = -100.0


def window_rms_db_host(pcm: np.ndarray, window: int, hop: int) -> np.ndarray:
    """Windowed RMS dB in numpy. Windowed RMS is ~0 FLOPs/byte — for audio
    that lives in HOST memory, shipping the waveform to the device costs more
    than the whole reduction on any hardware (and vastly more over a tunneled
    transport). The device version (window_rms_db) exists for audio that is
    already device-resident."""
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    n = len(pcm)
    num = 1 + (n - window) // hop
    sq = np.square(pcm)
    if window % hop == 0:
        k = window // hop
        nh = n // hop
        block = sq[: nh * hop].reshape(nh, hop).sum(axis=1)
        sums = np.convolve(block, np.ones(k, np.float32), mode="valid")[:num]
    else:
        csum = np.concatenate([[0.0], np.cumsum(sq)])
        starts = np.arange(num) * hop
        sums = csum[starts + window] - csum[starts]
    rms = np.sqrt(np.maximum(sums, 0.0) / window)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10))
    return np.maximum(db, _DB_FLOOR).astype(np.float32)


def window_rms_db_bucketed(pcm: np.ndarray, window: int, hop: int) -> np.ndarray:
    """Windowed RMS dB for host-resident audio — runs in numpy (see
    window_rms_db_host; the historical name is kept for callers/tests)."""
    pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
    if len(pcm) < window:
        return np.zeros((0,), np.float32)
    return window_rms_db_host(pcm, window, hop)


@partial(jax.jit, static_argnames=("window", "hop"))
def window_rms_db(pcm: jax.Array, window: int, hop: int) -> jax.Array:
    """RMS level in dBFS per window. pcm: (N,) float in [-1, 1].

    Returns (num_windows,) where num_windows = 1 + (N - window) // hop.

    When window is a multiple of hop (both production configs: 500 ms/100 ms
    segmentation windows and 50 ms/50 ms silencedetect), each window is an
    exact sum of window//hop hop-blocks — a (num_hops, hop) reshape-reduce plus
    a tiny rolling sum, instead of a full-length sequential cumsum (a 10-minute
    track is a 9.6M-element scan, the slowest shape on a vector unit).
    """
    n = pcm.shape[0]
    num = 1 + (n - window) // hop
    x = pcm.astype(jnp.float32)
    sq = jnp.square(x)
    if window % hop == 0:
        k = window // hop
        nh = n // hop
        block = sq[: nh * hop].reshape(nh, hop).sum(axis=1)  # (num_hops,)
        # rolling sum of k consecutive hop-blocks; windows never cross the
        # truncated tail because num = 1 + (n - window)//hop <= nh - k + 1
        sums = jnp.convolve(block, jnp.ones((k,), jnp.float32), mode="valid")[:num]
        sums = jnp.maximum(sums, 0.0)
    else:
        csum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sq)])
        starts = jnp.arange(num) * hop
        # fp32 cumsum differences can underflow slightly negative — clamp
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

    Per-window dB runs in numpy (window_rms_db_host), the boolean run-length
    pass too — the whole detector is host-side by design (see module doc).
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
    pcm: np.ndarray,
    sample_rate: int = 16000,
    threshold_db: float = -50.0,
    regions=None,
) -> float:
    """Fraction of the waveform inside silence regions (the reference skips audio
    >90% silent, batch_process.py:321-327). Pass `regions` when the caller
    already ran detect_silence_regions — re-running it doubles the full-track
    windowed-RMS pass (hour-long tracks: 57.6M samples squared twice)."""
    dur = len(pcm) / sample_rate
    if dur <= 0:
        return 1.0
    if regions is None:
        regions = detect_silence_regions(pcm, sample_rate, threshold_db)
    return min(1.0, sum(e - s for s, e in regions) / dur)
