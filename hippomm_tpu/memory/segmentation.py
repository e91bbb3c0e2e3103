"""Temporal pattern separation (reference: hippocampal_memory.py:980-1114).

Reference semantics: grow a window to max_segment_duration; walk backwards to
the LATEST boundary inside the window — a frame pair with SSIM < threshold, or
a 500 ms audio window with RMS < silence_db — respecting min_segment_duration;
cut there, repeat. The reference recomputes SSIM per pair by re-reading JPEGs
from disk inside the loop (:1052-1056) — quadratic disk traffic.

TPU-native reformulation: ONE batched device program scores every adjacent
frame pair (downscaled-gray SSIM) and every audio window (RMS dB); the greedy
boundary walk then runs over those two tiny fp32 vectors on host. Identical
segmentation semantics, ~zero marginal cost per window.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

from hippomm_tpu.memory.schema import SequenceSegment
from hippomm_tpu.utils.device import fetch
from hippomm_tpu.ops.resize import resize_frames
from hippomm_tpu.ops.ssim import adjacent_ssim, rgb_to_gray

SSIM_DOWNSCALE_H = 90  # reference computes SSIM on small grayscale frames
SSIM_DOWNSCALE_W = 160
AUDIO_WIN_S = 0.5
AUDIO_HOP_S = 0.1


def _fused_adjacent_ssim_impl(frames, h: int, w: int):
    return adjacent_ssim(rgb_to_gray(resize_frames(frames, h, w)))


_FUSED_ADJ = None


def adjacent_frame_similarity(frames_rgb: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 -> (T-1,) SSIM between consecutive frames, computed
    on device at a fixed downscale as ONE fused jitted program per 32-frame
    chunk (resize→gray→SSIM). Chunks overlap by one frame so every adjacent
    pair is scored; the fixed chunk width means ONE compiled shape for any
    video length (an hour-long video would otherwise mint a fresh multi-second
    compile for its padded frame count)."""
    import jax
    import jax.numpy as jnp

    global _FUSED_ADJ
    if _FUSED_ADJ is None:
        _FUSED_ADJ = jax.jit(_fused_adjacent_ssim_impl, static_argnames=("h", "w"))

    frames_rgb = np.asarray(frames_rgb)
    t = frames_rgb.shape[0]
    if t < 2:
        return np.zeros((0,), np.float32)
    CHUNK = 32
    sims: list = []
    host_mode = False
    lo = 0
    while lo < t - 1:
        chunk = frames_rgb[lo : lo + CHUNK]
        m = len(chunk)
        if not host_mode:
            padded = chunk
            if m < CHUNK:  # pad by repeating the last frame (pad pairs → SSIM 1)
                padded = np.concatenate([chunk, np.repeat(chunk[-1:], CHUNK - m, axis=0)])
            try:
                out = fetch(
                    _FUSED_ADJ(jnp.asarray(padded), SSIM_DOWNSCALE_H, SSIM_DOWNSCALE_W),
                    give_up_s=20.0,
                )
                sims.append(out[: m - 1])
                lo += CHUNK - 1
                continue
            except Exception as e:  # noqa: BLE001 — wedged or raising
                # transport both land on the host mirror
                logger.warning(
                    "adjacent-SSIM read failed (%s); scoring the rest on host numpy",
                    "wedged" if isinstance(e, TimeoutError) else repr(e),
                )
                host_mode = True
        sims.append(_adjacent_ssim_host_rgb(chunk))
        lo += CHUNK - 1  # overlap one frame: next chunk starts at this chunk's last
    return np.concatenate(sims)[: t - 1]


def _adjacent_ssim_host_rgb(chunk: np.ndarray) -> np.ndarray:
    """Host fallback for a wedged transport: downscale+luma+SSIM in numpy.
    Resize kernels differ slightly from the device program (box vs bilinear),
    which only nudges scores near the 0.95 boundary — an acceptable trade
    against stalling ingest for minutes on a sick link."""
    from hippomm_tpu.media.io import _luma_u8, downscale_rgb
    from hippomm_tpu.ops.ssim import ssim_pairs_host

    small = downscale_rgb(np.asarray(chunk), SSIM_DOWNSCALE_H, SSIM_DOWNSCALE_W)
    gray = _luma_u8(small).astype(np.float32)
    if len(gray) < 2:
        return np.zeros((0,), np.float32)
    return ssim_pairs_host(gray[:-1], gray[1:])


def adjacent_similarity_gray(grays: np.ndarray) -> np.ndarray:
    """(T, h, w) uint8 scoring-resolution luma -> (T-1,) adjacent SSIM.

    Same fixed-32-chunk execution as adjacent_frame_similarity but WITHOUT the
    resize+gray stage: the keyframe extractor already decoded every saved frame
    to scoring luma in C++, so segmentation can score boundaries from that —
    one tiny (32, 90, 160) transfer per chunk instead of re-shipping and
    re-resizing full RGB."""
    import jax.numpy as jnp

    from hippomm_tpu.ops.ssim import adjacent_ssim, ssim_pairs_host

    grays = np.asarray(grays)
    t = grays.shape[0]
    if t < 2:
        return np.zeros((0,), np.float32)
    if t <= 33:
        # one-chunk inputs compute on HOST: a keyframe-sparse video's saved
        # luma is a handful of (90, 160) frames and ssim_pairs_host finishes
        # in ~ms, while the device dispatch+fetch queues behind the in-flight
        # tower/ASR programs — the 60-min streamed ingest measured 2.4 s of
        # pure queue wait PER EMIT on a 13-keyframe video (36 s of its 60 s
        # wall), and the headline vlogs pay ~0.3 s/video the same way. Same
        # fp32 math as the device kernel (ssim_pairs_host mirrors ssim_pairs;
        # segmentation gates at 0.95 with wide margins).
        return ssim_pairs_host(grays[:-1], grays[1:], dtype=np.float32).astype(
            np.float32
        )
    CHUNK = 32
    # Dispatch EVERY chunk's kernel before reading any result: the per-chunk
    # synchronous fetch serialized one ~80-120 ms tunnel round trip per 32
    # frames (~0.45 s per 600 s vlog chunk, ~7% of the clean-window ingest
    # wall); pipelined, N round trips collapse to compute + one read floor.
    handles: list = []
    lo = 0
    while lo < t - 1:
        chunk = grays[lo : lo + CHUNK]
        m = len(chunk)
        padded = chunk
        if m < CHUNK:
            padded = np.concatenate([chunk, np.repeat(chunk[-1:], CHUNK - m, axis=0)])
        handles.append((lo, m, adjacent_ssim(jnp.asarray(padded))))
        lo += CHUNK - 1
    sims: list = []
    host_mode = False
    for lo, m, handle in handles:
        if not host_mode:
            try:
                sims.append(fetch(handle, give_up_s=20.0)[: m - 1])
                continue
            except Exception as e:  # noqa: BLE001 — wedged or raising transport
                # the luma is already host-resident; ssim_pairs_host is the
                # exact numpy mirror of the device kernel — zero further
                # transport exposure for this video's segmentation scoring
                logger.warning(
                    "adjacent-SSIM (gray) read failed (%s); scoring on host",
                    "wedged" if isinstance(e, TimeoutError) else repr(e),
                )
                host_mode = True
        g = grays[lo : lo + m].astype(np.float32)
        sims.append(ssim_pairs_host(g[:-1], g[1:]) if m > 1 else np.zeros((0,), np.float32))
    return np.concatenate(sims)[: t - 1]


def audio_window_levels(
    audio: Optional[np.ndarray], sample_rate: int = 16000
) -> Optional[np.ndarray]:
    """(S,) pcm -> per-window RMS dB at 500 ms / 100 ms hop (device reduction)."""
    if audio is None:
        return None
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    win = int(AUDIO_WIN_S * sample_rate)
    hop = int(AUDIO_HOP_S * sample_rate)
    if len(audio) < win:
        return None
    # power-of-two length bucketing: one compile per bucket, result trimmed to
    # the true window count (ops/silence.window_rms_db_bucketed)
    from hippomm_tpu.ops.silence import window_rms_db_bucketed

    return window_rms_db_bucketed(audio, win, hop)


def find_boundaries(
    frame_times: Sequence[float],
    frame_ssim: np.ndarray,
    audio_db: Optional[np.ndarray],
    duration: float,
    max_segment: float = 30.0,
    min_segment: float = 10.0,
    ssim_threshold: float = 0.95,
    silence_db: float = -40.0,
    audio_hop_s: float = AUDIO_HOP_S,
) -> List[float]:
    """Greedy boundary times over precomputed scores (reference walk-back
    semantics, hippocampal_memory.py:1043-1084). Returns interior cut times."""
    frame_times = np.asarray(frame_times, dtype=np.float64)
    cuts: List[float] = []
    start = 0.0
    while duration - start > max_segment:
        lo, hi = start + min_segment, start + max_segment
        best: Optional[float] = None

        # latest dissimilar frame pair inside (lo, hi]: boundary at pair's 2nd frame
        if len(frame_ssim):
            pair_t = frame_times[1:]  # boundary time = time of the later frame
            mask = (pair_t > lo) & (pair_t <= hi) & (frame_ssim < ssim_threshold)
            idx = np.nonzero(mask)[0]
            if len(idx):
                best = float(pair_t[idx[-1]])

        # latest silent audio window inside (lo, hi]
        if audio_db is not None and len(audio_db):
            win_t = np.arange(len(audio_db)) * audio_hop_s + AUDIO_WIN_S / 2
            mask = (win_t > lo) & (win_t <= hi) & (audio_db < silence_db)
            idx = np.nonzero(mask)[0]
            if len(idx):
                cand = float(win_t[idx[-1]])
                best = cand if best is None else max(best, cand)

        if best is None:
            best = hi  # hard cut at max duration
        cuts.append(best)
        start = best
    return cuts


def segment_sequence(
    frame_paths: Sequence[str],
    frame_times: Sequence[float],
    frames_rgb: Optional[np.ndarray],
    audio: Optional[np.ndarray],
    sample_rate: int = 16000,
    max_segment: float = 30.0,
    min_segment: float = 10.0,
    ssim_threshold: float = 0.95,
    silence_db: float = -40.0,
    duration: Optional[float] = None,
    precomputed_ssim: Optional[np.ndarray] = None,
) -> List[SequenceSegment]:
    """Full temporal pattern separation -> SequenceSegments with sliced frames
    and audio (reference: _segment_sequence, hippocampal_memory.py:1002-1114).

    `precomputed_ssim` ((T-1,) adjacent-pair SSIM, e.g. from the extractor's
    scoring luma) skips the on-device resize+gray+SSIM recompute."""
    frame_times = list(map(float, frame_times))
    if duration is None:
        candidates = []
        if frame_times:
            candidates.append(frame_times[-1] + 1e-3)
        if audio is not None:
            candidates.append(len(audio) / sample_rate)
        duration = max(candidates) if candidates else 0.0

    if precomputed_ssim is not None:
        ssim = np.asarray(precomputed_ssim, np.float32)
    elif frames_rgb is not None and len(frames_rgb) >= 2:
        ssim = adjacent_frame_similarity(frames_rgb)
    else:
        ssim = np.zeros((0,), np.float32)
    db = audio_window_levels(audio, sample_rate)
    cuts = find_boundaries(
        frame_times, ssim, db, duration, max_segment, min_segment, ssim_threshold, silence_db
    )
    bounds = [0.0] + cuts + [duration]

    segments: List[SequenceSegment] = []
    ft = np.asarray(frame_times, dtype=np.float64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e <= s:
            continue
        sel = np.nonzero((ft >= s) & (ft < e))[0] if len(ft) else np.zeros((0,), int)
        seg_audio = None
        if audio is not None:
            seg_audio = np.asarray(audio[int(s * sample_rate) : int(e * sample_rate)])
        segments.append(
            SequenceSegment(
                start_time=float(s),
                end_time=float(e),
                frames=[frame_paths[i] for i in sel] if frame_paths else [],
                audio_data=seg_audio,
                frame_times=[frame_times[i] for i in sel],
            )
        )
    return segments
