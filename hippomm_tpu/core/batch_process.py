"""Ingestion pipeline + batch CLI (reference: hippomm/core/batch_process.py).

Same public surface — extract_frames_from_video (:116), extract_audio_from_video
(:257), process_single_video (:380), process_video_folder (:437),
process_memory_sync (:666), main (:749) — re-planned for TPU:

  * video decode via the C++ media shim (no cv2.VideoCapture python loop)
  * frame-difference key-framing as ONE batched device SSIM program over
    ~1 Hz candidates (the reference SSIMs pairs in Python every 30th frame)
  * silence detection as a host numpy RMS reduction (no ffmpeg subprocess)
  * the engine receives in-memory RGB + audio, so nothing is re-read from disk
  * the streaming consumer (process_memory_sync) is the CORRECTED version of
    the reference's broken path (nonexistent consolidate_video_memories,
    missing video_id — batch_process.py:732, :739-742)

Containers: .mp4/.mov/.mkv/.webm/.avi via the libav shim (the reference's full
input set, batch_process.py:441) plus .y4m and MJPEG-AVI fast paths. Audio is
demuxed from the container in-process (the reference shelled out to ffmpeg,
batch_process.py:266-290); a sibling `<stem>.wav` is the fallback for
video-only containers.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import logging
import os
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from hippomm_tpu.config import Config, load_config
from hippomm_tpu.utils.device import fetch
from hippomm_tpu.utils.timers import Throughput

logger = logging.getLogger(__name__)

# reference set (batch_process.py:441) + our native fast-path containers
VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".y4m", ".webm", ".m4v")
# audio-only ingest (beyond the reference; driver bench config #2 shape:
# silence segmentation + Whisper + ImageBind audio embeddings, no frames)
AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".m4a", ".aac", ".ogg")


# ---------------------------------------------------------------------------
# Frame extraction
# ---------------------------------------------------------------------------


def compute_frame_difference(frame_a: np.ndarray, frame_b: np.ndarray) -> float:
    """1 - SSIM between two RGB frames (reference: batch_process.py:32-71)."""
    import jax.numpy as jnp

    from hippomm_tpu.ops.ssim import frame_difference, rgb_to_gray

    g = rgb_to_gray(jnp.asarray(np.stack([frame_a, frame_b])))
    return float(fetch(frame_difference(g[:1], g[1:]))[0])


def save_frame(frame_rgb: np.ndarray, path: str, quality: int = 90) -> None:
    """(reference: batch_process.py:73-114)"""
    from hippomm_tpu.media.io import write_jpeg

    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_jpeg(path, frame_rgb, quality)


def select_keyframes_greedy(
    grays: np.ndarray,
    times: Sequence[float],
    score_fn,
    max_diff_threshold: float = 0.3,
    min_interval_s: float = 1.0,
) -> List[int]:
    """Reference-exact greedy key-frame selection over candidate grayscale
    frames (reference: batch_process.py:170-230):

      * candidate 0 is always selected (the first frame)
      * each later candidate is gated by >= min_interval_s since the last SAVE
      * diff = 1 - SSIM(candidate, LAST-SAVED frame); a running cumulative sum
        of diffs (reset on save) also triggers at the same threshold
      * gated-out candidates do NOT accumulate

    `score_fn(ref_gray, grays_block) -> (B,) ssim` is one batched device
    program over a block of candidates; it is re-invoked per block plus once
    per save (a save changes the reference frame), so the device call count is
    n/block + number-of-saves — not one per candidate — and every call has the
    same compiled shape.

    Pure selection logic, shared by the extractor and its oracle test.
    """
    n = len(grays)
    if n == 0:
        return []
    selected = [0]
    last_save_time = float(times[0])
    cumulative = 0.0
    block = 256
    for b0 in range(0, n, block):
        b1 = min(n, b0 + block)
        ref = selected[-1]
        sims = np.asarray(score_fn(grays[ref], grays[b0:b1]))
        for j in range(max(b0, 1), b1):
            if float(times[j]) - last_save_time < min_interval_s:
                continue
            if selected[-1] != ref:  # a save inside this block: re-reference
                ref = selected[-1]
                sims = np.asarray(score_fn(grays[ref], grays[b0:b1]))
            diff = 1.0 - float(sims[j - b0])
            cumulative += diff
            if diff > max_diff_threshold or cumulative > max_diff_threshold:
                selected.append(j)
                last_save_time = float(times[j])
                cumulative = 0.0
    return selected


def extract_frames_from_video(
    video_path: str,
    output_dir: str,
    video_id: Optional[str] = None,
    max_diff_threshold: float = 0.3,
    min_interval_s: float = 1.0,
    keep_rgb: bool = True,
    score_hw: Tuple[int, int] = (90, 160),
    timers=None,
    vision_stream=None,
) -> Dict:
    """Dynamic key-frame extraction (reference: batch_process.py:116-255).

    Selection semantics match the reference exactly (see
    select_keyframes_greedy); candidates are time-based at min_interval_s
    spacing — the reference's `frame_count % 30` is its 30 fps-specific
    approximation of the same 1 Hz cadence (its own comment,
    batch_process.py:123). Two deliberate throughput deviations:

      * scoring runs on (90, 160) luma produced by the decoder itself
        (C++ SWS_AREA scale / y4m Y-plane), so the host never touches full
        RGB except for the few frames actually saved
      * key-frame JPEGs are encoded on a background pool, off the hot loop

    `vision_stream` (a `VisionEncodeStream`) receives each kept frame's RGB
    the moment its scan mask is flushed, so the ViT tower runs on device
    DURING the host-bound decode; it is attached to the returned meta as
    "vision_stream" only when this extraction actually fed it completely
    (a metadata.yaml resume reads JPEGs instead and feeds nothing).

    Idempotent: resumes from metadata.yaml when all frames exist (:137-149).
    """
    from hippomm_tpu.utils.timers import StageTimer

    timers = timers if timers is not None else StageTimer()
    video_id = video_id or os.path.splitext(os.path.basename(video_path))[0]
    frames_dir = os.path.join(output_dir, "frames", video_id)
    meta_path = os.path.join(frames_dir, "metadata.yaml")

    # idempotent resume
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                meta = yaml.safe_load(f)
            if meta and all(os.path.exists(p) for p in meta.get("frame_paths", [])):
                logger.info("frames already extracted for %s", video_id)
                meta["resumed"] = True
                if keep_rgb:
                    from hippomm_tpu.media.io import read_jpeg

                    meta["frames_rgb"] = np.stack(
                        [read_jpeg(p) for p in meta["frame_paths"]]
                    ) if meta["frame_paths"] else None
                return meta
        except Exception:
            logger.exception("bad metadata for %s; re-extracting", video_id)

    chunks: List[Dict] = []
    meta: Dict = {}
    for item in extract_frames_streaming(
        video_path,
        output_dir,
        video_id,
        max_diff_threshold=max_diff_threshold,
        min_interval_s=min_interval_s,
        score_hw=score_hw,
        emit_seconds=float("inf"),
        timers=timers,
        _meta_out=meta,
        vision_stream=vision_stream,
    ):
        chunks.append(item)
    out = dict(meta)
    out["resumed"] = False
    if keep_rgb:
        rgbs = [c["frames_rgb"] for c in chunks if c["frames_rgb"] is not None]
        out["frames_rgb"] = np.concatenate(rgbs) if rgbs else None
    if vision_stream is not None:
        # the engine consumes the prefetched features instead of
        # re-dispatching the tower: one row per frames_rgb row, in order —
        # either fed keyframes directly, or (short clips) every candidate,
        # indexed down to the kept rows here
        rows = out.pop("vision_candidate_rows", None)
        out["vision_stream"] = (
            _IndexedVisionStream(vision_stream, rows) if rows is not None else vision_stream
        )
        # all frames are fed: dispatch the (<32) remainder NOW so the tower
        # programs enter the device FIFO before the next video's ASR does —
        # the engine's later result() becomes a pure fetch (the clean r3
        # record still paid a 4.7 s/run encode_vision tail to this ordering)
        fin = getattr(out["vision_stream"], "finalize", None)
        if fin is not None:  # optional lifecycle on duck-typed streams
            fin()
    return out


class _IndexedVisionStream:
    """View of a per-CANDIDATE `VisionEncodeStream` reduced to the kept
    keyframe rows (short-clip early dispatch — see encode_all_candidates in
    extract_frames_streaming). Same .result() surface the engine consumes."""

    def __init__(self, stream, rows):
        self._stream = stream
        self._rows = np.asarray(rows, dtype=np.int64)

    def result(self) -> np.ndarray:
        return self._stream.result()[self._rows]

    def finalize(self) -> None:
        fin = getattr(self._stream, "finalize", None)
        if fin is not None:
            fin()

    def close(self) -> None:
        if hasattr(self._stream, "close"):
            self._stream.close()


def extract_frames_streaming(
    video_path: str,
    output_dir: str,
    video_id: Optional[str] = None,
    max_diff_threshold: float = 0.3,
    min_interval_s: float = 1.0,
    score_hw: Tuple[int, int] = (90, 160),
    emit_seconds: float = 300.0,
    timers=None,
    _meta_out: Optional[Dict] = None,
    vision_stream=None,
):
    """Streaming key-frame extraction: yields a chunk dict roughly every
    `emit_seconds` of media WHILE decode continues, so a long video's engine
    stages (towers, segmentation) can run on chunk N as the host decodes chunk
    N+1. The greedy-walk carry spans chunks — the selected key-frame set is
    IDENTICAL to a whole-video pass.

    Chunk dict: {chunk_start, chunk_duration, frame_paths, frame_times
    (global), frames_rgb, frame_ssim (adjacent pairs within the chunk)}.
    metadata.yaml is written after the final chunk (into `_meta_out` too).

    Single decode pass: each candidate is decoded ONCE (C++ holds refcounted
    AVFrames; scoring luma eagerly, full RGB lazily only for kept frames).
    The device scan for block i runs while the host decodes block i+1 (async
    dispatch; masks materialized late via opportunistic is_ready polling —
    a blocking read could sit behind a multi-second ASR program in the device
    queue). 256-candidate blocks keep round trips rare; sparse candidate
    strides skip decoding non-reference frames entirely.
    """
    from hippomm_tpu.media.io import open_video
    from hippomm_tpu.memory.segmentation import adjacent_similarity_gray
    from hippomm_tpu.ops.keyframe import BLOCK as SCAN_BLOCK
    from hippomm_tpu.ops.keyframe import KeyframeScanner
    from hippomm_tpu.utils.timers import StageTimer
    from collections import deque

    timers = timers if timers is not None else StageTimer()
    video_id = video_id or os.path.splitext(os.path.basename(video_path))[0]
    frames_dir = os.path.join(output_dir, "frames", video_id)
    meta_path = os.path.join(frames_dir, "metadata.yaml")

    sh, sw = score_hw
    reader = open_video(video_path)
    info = reader.info
    stride = max(1, int(round(info.fps * min_interval_s)))
    candidate_idx = list(range(0, info.num_frames, stride))
    times = [i / info.fps for i in candidate_idx]

    # Short clips (≤2 vision chunks of candidates): encode ALL candidates the
    # moment their block decodes, instead of waiting for the scan mask to pick
    # keyframes. Keyframes ⊆ candidates, so the engine just indexes rows —
    # and since a ≤32-candidate clip is ONE padded 32-wide tower program
    # whether it holds 10 keyframes or 30 candidates, the early dispatch is
    # free compute-wise and removes the mask read (which queues behind the
    # in-flight full-track ASR) from the vision critical path entirely
    # (VERDICT r2 next-#6: short-clip fixed overhead).
    # HIPPOMM_ENCODE_ALL_MAX tunes the gate (default 64): a 33-64-candidate
    # clip pays a SECOND padded 32-wide tower program for the early dispatch
    # — whether mask-wait + one keyframe program beats it depends on how far
    # the mask read queues behind the in-flight ASR (measure with
    # scripts/clip30_micro.py before changing the default)
    encode_all_candidates = (
        vision_stream is not None
        and not np.isfinite(emit_seconds)  # whole-video mode: single emit
        and len(candidate_idx)
        <= int(os.environ.get("HIPPOMM_ENCODE_ALL_MAX", "64"))
    )

    # scan-block size: 256 candidates per device round trip normally; a
    # smaller fixed shape when the emit cadence is finer than a block (chunks
    # can only be cut at block boundaries, so a 300 s cadence over 256 s
    # blocks would round UP to 512 s chunks — ~70% more per-chunk RGB memory
    # and engine latency than the sizing assumes). Two compiled shapes total.
    cand_per_emit = emit_seconds / max(min_interval_s, 1e-6)
    if not np.isfinite(cand_per_emit):  # whole-video mode: no emit cadence
        block = SCAN_BLOCK
    elif cand_per_emit >= SCAN_BLOCK:
        overshoot = (
            np.ceil(cand_per_emit / SCAN_BLOCK) * SCAN_BLOCK - cand_per_emit
        ) / cand_per_emit
        block = SCAN_BLOCK if overshoot <= 0.25 else 64
    else:
        block = 64
    scanner = KeyframeScanner(sh, sw, max_diff_threshold, min_interval_s, block=block)
    pending: "deque" = deque()  # (cand_offset, device mask handle, held block)
    held_frame_bytes = int(info.width * info.height * 1.6) * block
    max_hold = max(1, (512 << 20) // max(1, held_frame_bytes))

    all_gray_blocks: List[np.ndarray] = []  # tiny; reused for metadata ssim
    all_saved_cand: List[int] = []
    all_saved_paths: List[str] = []
    all_saved_times: List[float] = []
    # per-chunk accumulators (reset at each emit)
    cur_cand: List[int] = []
    cur_rgb: List[np.ndarray] = []
    cur_gray: List[np.ndarray] = []  # saved frames' scoring luma, this chunk
    chunk_start = 0.0
    jpeg_pool = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    jpeg_futs: List = []

    def _flush(entry):
        off, handle, blk = entry
        mask = handle.get()  # device read, or host recompute if it wedges
        js = np.nonzero(mask)[0]
        if len(js):
            cur_cand.extend(off + int(j) for j in js)
            rgb = blk.take_rgb(js)
            cur_rgb.append(rgb)
            cur_gray.append(blk.gray[js])
            if vision_stream is not None and not encode_all_candidates:
                # async tower dispatch over the kept frames: the ViT forward
                # runs behind the remaining decode instead of after it
                with timers.stage("extract_vision_feed"):
                    vision_stream.feed(rgb)
        blk.close()

    def _emit(chunk_end: float) -> Dict:
        nonlocal chunk_start, cur_cand, cur_rgb, cur_gray
        rgb = np.concatenate(cur_rgb) if cur_rgb else None
        c_times = [times[j] for j in cur_cand]
        paths: List[str] = []
        with timers.stage("extract_jpeg_save"):
            for k, t in enumerate(c_times):
                sec_dir = os.path.join(frames_dir, f"t_{int(t)}")
                path = os.path.join(sec_dir, f"frame_{len(all_saved_paths) + k}.jpg")
                paths.append(path)
                jpeg_futs.append(jpeg_pool.submit(save_frame, rgb[k], path))
        with timers.stage("extract_seg_ssim"):
            # only THIS chunk's saved-frame luma — re-concatenating the whole
            # video's gray blocks per emit would be O(N²) over a long ingest
            ssim = (
                adjacent_similarity_gray(np.concatenate(cur_gray)) if cur_cand else None
            )
        chunk = {
            "chunk_start": chunk_start,
            "chunk_duration": chunk_end - chunk_start,
            "frame_paths": paths,
            "frame_times": c_times,
            "frames_rgb": rgb,
            "frame_ssim": ssim,
        }
        all_saved_cand.extend(cur_cand)
        all_saved_paths.extend(paths)
        all_saved_times.extend(c_times)
        cur_cand, cur_rgb, cur_gray = [], [], []
        chunk_start = chunk_end
        return chunk

    completed = False
    try:
        with timers.stage("extract_decode"):
            for b0 in range(0, len(candidate_idx), block):
                batch = candidate_idx[b0 : b0 + block]
                with timers.stage("extract_decode_c"):
                    blk = reader.read_block(batch, sh, sw, skip_nonref=stride >= 8)
                all_gray_blocks.append(blk.gray)
                with timers.stage("extract_feed"):
                    handle = scanner.feed(blk.gray, times[b0 : b0 + block])
                if encode_all_candidates:
                    # after the (tiny) scan dispatch so the mask is not stuck
                    # behind the tower forward in the device FIFO
                    with timers.stage("extract_vision_feed"):
                        vision_stream.feed(blk.take_rgb(np.arange(len(batch))))
                with timers.stage("extract_flush"):
                    pending.append((b0, handle, blk))
                    while pending and (len(pending) > max_hold or pending[0][1].is_ready()):
                        _flush(pending.popleft())
                block_end_t = times[min(b0 + block, len(times)) - 1]
                last_block = b0 + block >= len(candidate_idx)
                if not last_block and block_end_t - chunk_start >= emit_seconds:
                    with timers.stage("extract_score"):
                        # one batched mask read instead of a tunnel round
                        # trip per block (serial path covers stragglers)
                        scanner.prefetch_masks([h for _, h, _ in pending])
                        while pending:
                            _flush(pending.popleft())
                    yield _emit(block_end_t + min_interval_s / 2)
        with timers.stage("extract_score"):
            scanner.prefetch_masks([h for _, h, _ in pending])
            while pending:
                _flush(pending.popleft())
        completed = True
    finally:
        # abandoned mid-stream (consumer failed, generator .close()d): release
        # held AVFrame blocks, the decoder, and the JPEG pool
        for _, _, blk in pending:
            blk.close()
        pending.clear()
        scanner.close()  # drop retained luma / host-walk caches
        reader.close()
        if not completed:
            jpeg_pool.shutdown(wait=False)
    final = _emit(info.duration if info.duration else (times[-1] + min_interval_s if times else 0.0))

    # metadata over the WHOLE video (resume path recomputes nothing)
    with timers.stage("extract_seg_ssim"):
        if not all_saved_cand:
            full_ssim = None
        elif not np.isfinite(emit_seconds):
            # whole-video mode emits exactly once, so the final chunk's
            # adjacent pairs ARE the whole-video pairs — recomputing them was
            # a second synchronous device round trip per video (~0.4 s on the
            # tunneled transport, ~30% of a 30 s clip's post-warm wall)
            full_ssim = np.asarray(final["frame_ssim"], np.float32)
        else:
            grays_all = np.concatenate(all_gray_blocks)
            full_ssim = adjacent_similarity_gray(grays_all[all_saved_cand])
    with timers.stage("extract_jpeg_save"):
        for f in jpeg_futs:
            f.result()
        jpeg_pool.shutdown(wait=True)
    meta = {
        "video_id": video_id,
        "video_path": video_path,
        "fps": info.fps,
        "duration": info.duration,
        "num_source_frames": info.num_frames,
        "frame_paths": all_saved_paths,
        "frame_times": [float(t) for t in all_saved_times],
        "frame_ssim": [float(s) for s in full_ssim] if full_ssim is not None else None,
    }
    os.makedirs(frames_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        yaml.safe_dump(meta, f)
    if _meta_out is not None:
        _meta_out.update(meta)
        if encode_all_candidates:
            # stream rows are per-CANDIDATE; kept keyframes are these rows
            _meta_out["vision_candidate_rows"] = list(all_saved_cand)
    yield final


# ---------------------------------------------------------------------------
# Audio extraction
# ---------------------------------------------------------------------------


def extract_audio_from_video(
    video_path: str,
    output_dir: str,
    video_id: Optional[str] = None,
    silence_db: float = -50.0,
    skip_silent_fraction: float = 0.9,
) -> Dict:
    """Audio track → 16 kHz mono + silence analysis (reference:
    batch_process.py:257-378 — ffmpeg subprocess demux + silencedetect; here
    the container audio is demuxed IN-PROCESS by the libav shim and silence
    runs as a device RMS reduction). A sibling `<stem>.wav` is the fallback
    for video-only containers (.y4m/MJPEG-AVI fixtures).
    Writes audio/<video_id>/audio.npy + metadata.yaml; idempotent."""
    from hippomm_tpu.media.io import demux_audio, load_audio_mono16k
    from hippomm_tpu.ops.silence import detect_silence_regions, silence_fraction

    video_id = video_id or os.path.splitext(os.path.basename(video_path))[0]
    audio_dir = os.path.join(output_dir, "audio", video_id)
    meta_path = os.path.join(audio_dir, "metadata.yaml")
    npy_path = os.path.join(audio_dir, "audio.npy")

    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = yaml.safe_load(f) or {}
        if os.path.exists(npy_path):
            meta["resumed"] = True
            meta["audio"] = np.load(npy_path)
            return meta
        if meta.get("skipped_as_silent") or not meta.get("has_audio", True):
            # skipped-as-silent / no-audio runs never write audio.npy — the
            # metadata alone IS the resume state; re-demuxing + re-scanning
            # the full track on every re-ingest contradicts "idempotent"
            meta["resumed"] = True
            meta["audio"] = None
            return meta

    pcm = None
    ext = os.path.splitext(video_path)[1].lower()
    if ext not in (".y4m",):  # containers that can carry audio
        try:
            pcm = demux_audio(video_path)
        except Exception:
            logger.exception("container audio demux failed for %s", video_id)
    if pcm is None:
        wav_path = os.path.splitext(video_path)[0] + ".wav"
        if not os.path.exists(wav_path):
            meta = {"video_id": video_id, "has_audio": False, "audio": None, "resumed": False}
            os.makedirs(audio_dir, exist_ok=True)
            with open(meta_path, "w") as f:
                yaml.safe_dump({k: v for k, v in meta.items() if k != "audio"}, f)
            return meta
        pcm = load_audio_mono16k(wav_path)
    regions = detect_silence_regions(pcm, 16000, silence_db)
    frac = silence_fraction(pcm, 16000, silence_db, regions=regions)
    skipped = frac > skip_silent_fraction
    meta = {
        "video_id": video_id,
        "has_audio": not skipped,
        "duration": len(pcm) / 16000.0,
        "sample_rate": 16000,
        "silence_fraction": float(frac),
        "silence_regions": [[float(s), float(e)] for s, e in regions],
        "skipped_as_silent": bool(skipped),
    }
    os.makedirs(audio_dir, exist_ok=True)
    if not skipped:
        np.save(npy_path, pcm)
    with open(meta_path, "w") as f:
        yaml.safe_dump(meta, f)
    meta["audio"] = None if skipped else pcm
    meta["resumed"] = False
    return meta


# ---------------------------------------------------------------------------
# Per-video + folder orchestration
# ---------------------------------------------------------------------------


def process_single_video(
    video_path: str,
    memory_store_dir: str,
    video_id: Optional[str] = None,
    timers=None,
    memory_system=None,
) -> Dict:
    """Frame + audio extraction, concurrently (reference: batch_process.py:380-435
    used a ProcessPoolExecutor(2); threads suffice — the heavy work is in C++/XLA
    which releases the GIL). When a memory_system is supplied, the full-track
    ASR launches as soon as audio is demuxed, overlapping the (host-bound)
    frame decode with the (device-bound) Whisper pass."""
    video_id = video_id or os.path.splitext(os.path.basename(video_path))[0]
    if os.path.splitext(video_path)[1].lower() in AUDIO_EXTENSIONS:
        # audio-only ingest: no frame track (driver bench config #2 shape)
        audio = extract_audio_from_video(video_path, memory_store_dir, video_id)
        frames = {
            "video_id": video_id,
            "frame_paths": [],
            "frame_times": [],
            "frames_rgb": None,
            "duration": audio.get("duration"),
        }
        return {"video_id": video_id, "video_path": video_path, "frames": frames, "audio": audio}
    vision_stream = None
    if memory_system is not None and getattr(memory_system, "imagebind", None) is not None:
        # keyframes dispatch their ViT forward the moment they are flushed,
        # hiding the vision encode behind the host-bound decode (the engine
        # consumes the prefetched features via process_sequence)
        vision_stream = memory_system.imagebind.vision_stream()
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            f_frames = ex.submit(
                extract_frames_from_video, video_path, memory_store_dir, video_id,
                timers=timers, vision_stream=vision_stream,
            )
            f_audio = ex.submit(extract_audio_from_video, video_path, memory_store_dir, video_id)
            audio = f_audio.result()
            # Overlap the ASR with frame decode by DISPATCHING it from this
            # thread (async device programs) and syncing later in
            # process_sequence. A worker-thread prefetch was measured to fight
            # the single host core and starve the extraction scan (10-min
            # vlog: 19s -> 34s); eager dispatch + late sync overlaps the same
            # work with no second thread.
            if memory_system is not None and audio.get("audio") is not None:
                memory_system.dispatch_asr(video_id, audio["audio"])
            frames = f_frames.result()
    except BaseException:
        # audio failed after extraction fed the stream (or vice versa): join
        # the stream's worker and drop its dispatched ViT buffers so a folder
        # run with failing videos doesn't accumulate device memory (ADVICE r3
        # #3). The folder loop's discard_pending handles the engine side.
        if vision_stream is not None and hasattr(vision_stream, "close"):
            vision_stream.close()
        raise
    return {"video_id": video_id, "video_path": video_path, "frames": frames, "audio": audio}


# Videos longer than this ingest chunk-by-chunk: the engine encodes chunk N on
# device while the host decodes chunk N+1 (within-video pipelining). At
# ~2-chunk scale the overlap is eaten by device-queue and single-core host
# contention (measured: a 600 s vlog is no faster streamed); the win appears
# from ~3+ chunks where decode dominates and chunk engine work amortizes.
STREAMING_THRESHOLD_S = 900.0
STREAM_CHUNK_S = 300.0


def process_single_video_streaming(
    video_path: str,
    memory_store_dir: str,
    video_id: Optional[str] = None,
    memory_system=None,
    chunk_seconds: float = STREAM_CHUNK_S,
    config: Optional[Config] = None,
) -> Dict:
    """Chunked ingest for LONG videos: extraction yields ~chunk_seconds chunks
    (extract_frames_streaming) and each chunk runs through process_sequence
    with base_time offsets while the next chunk decodes. The full-track ASR is
    dispatched ONCE up front (global timestamps); consolidation + replay run
    once at the end, so the video still produces a single ThetaEvent exactly
    like the whole-video path (reference base_time flow,
    hippocampal_memory.py:1134).

    The up-front dispatch was re-validated r5 against a per-chunk-async
    alternative with a steady-state interleaved A/B (900 s, post-warm, same
    process): up-front 8.7/9.2 s vs per-chunk 10.5/10.7 s vs ASR-stubbed
    8.0-8.5 s — the full track's ASR absorbs entirely under chunk 0's decode
    and never blocks again, while per-chunk dispatches land ahead of the
    NEXT chunk's streaming vision feeds in the device FIFO (encode_vision
    5.1 s vs 1.7-2.1 s). Earlier readings that suggested the up-front flow
    was slow were first-ingest-in-process warmth artifacts (a biased A/B
    order), not steady state."""
    mem = memory_system
    if mem is None:  # the advertised default crashed with AttributeError
        from hippomm_tpu.memory.engine import HippocampalMemory

        cfg = config or load_config(None)
        cfg.storage.base_dir = memory_store_dir
        mem = HippocampalMemory(config=cfg)
    video_id = video_id or os.path.splitext(os.path.basename(video_path))[0]
    audio_meta = extract_audio_from_video(video_path, memory_store_dir, video_id)
    audio = audio_meta.get("audio")
    sr = int(audio_meta.get("sample_rate", 16000) or 16000)
    mem.add_video(video_id, video_path)
    # A failed earlier streaming attempt leaves its STMs in the buffer and a
    # partial checkpoint on disk; chunk 0 runs with resume=False (which
    # bypasses the checkpoint short-circuit) and would extend() onto the stale
    # state, duplicating every segment in the final ThetaEvent.
    mem.short_term_buffer[video_id] = []
    mem.store.delete_checkpoint(video_id)
    if audio is not None:
        mem.dispatch_asr(video_id, audio, sr)
    # The extractor runs on a PRODUCER thread pushing chunks through a bounded
    # queue: chunk N+1 decodes while this thread runs chunk N's device-bound
    # engine stages (a plain generator would serialize — it only advances when
    # the consumer asks). It also mirrors the short-video path's threading
    # shape, where extraction reads device results from a different thread
    # than the one that dispatched the ASR (same-thread reads have been
    # observed to wedge the tunneled transport for minutes).
    meta: Dict = {}
    n_chunks = 0
    chunk_q: "queue.Queue" = queue.Queue(maxsize=1)
    stop = threading.Event()  # consumer died: producer must unwind, not block
    _DONE = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                chunk_q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _produce():
        gen = extract_frames_streaming(
            video_path,
            memory_store_dir,
            video_id,
            emit_seconds=chunk_seconds,
            timers=getattr(mem, "timers", None),
            _meta_out=meta,
        )
        try:
            for c in gen:
                if not _put(c):  # consumer gone: trigger the generator's
                    gen.close()  # finally (frees decoder + held AVFrames)
                    return
            _put(_DONE)
        except BaseException as e:  # propagate into the consumer
            _put(e)

    producer = threading.Thread(target=_produce, daemon=True)
    producer.start()
    try:
        while True:
            chunk = chunk_q.get()
            if chunk is _DONE:
                break
            if isinstance(chunk, BaseException):
                raise chunk
            t0c = chunk["chunk_start"]
            dur = chunk["chunk_duration"]
            seg_audio = None
            if audio is not None:
                seg_audio = audio[int(t0c * sr) : int((t0c + dur) * sr)]
            fssim = chunk["frame_ssim"]
            mem.process_sequence(
                video_id,
                frame_paths=chunk["frame_paths"],
                frame_times=[t - t0c for t in chunk["frame_times"]],
                frames_rgb=chunk["frames_rgb"],
                audio_data=seg_audio,
                sample_rate=sr,
                video_duration=dur,
                auto_consolidate=False,
                base_time=t0c,
                frame_ssim=np.asarray(fssim, np.float32) if fssim is not None else None,
                resume=False,
            )
            n_chunks += 1
    finally:
        # consumer failed (or finished): release a producer blocked on put
        stop.set()
        try:
            while True:
                chunk_q.get_nowait()
        except queue.Empty:
            pass
    mem.consolidate(video_id)
    mem.replay(video_id)
    frames = dict(meta)
    frames["streamed_chunks"] = n_chunks
    return {
        "video_id": video_id,
        "video_path": video_path,
        "frames": frames,
        "audio": audio_meta,
        "streamed": True,
    }


def process_video_folder(
    folder: str,
    memory_store_dir: str,
    config: Optional[Config] = None,
    memory_system=None,
    sort_by: str = "name",
    checkpoint_every: int = 5,
    limit: Optional[int] = None,
    skip_existing: bool = True,
    pipeline_lookahead: bool = True,
) -> Dict:
    """Batch ingest driver (reference: batch_process.py:437-663).

    pipeline_lookahead=True overlaps video N+1's host-bound extraction with
    video N's device-bound engine stages (one extraction in flight)."""
    from hippomm_tpu.memory.engine import HippocampalMemory

    config = config or load_config(None)
    config.storage.base_dir = memory_store_dir
    mem = memory_system or HippocampalMemory(config=config)

    listing = os.listdir(folder)
    video_stems = {
        os.path.splitext(f)[0]
        for f in listing
        if os.path.splitext(f)[1].lower() in VIDEO_EXTENSIONS
    }
    videos = [
        os.path.join(folder, f)
        for f in listing
        if os.path.splitext(f)[1].lower() in VIDEO_EXTENSIONS
        or (
            os.path.splitext(f)[1].lower() in AUDIO_EXTENSIONS
            # a .wav sharing a video's stem is that video's audio track, not
            # a standalone audio ingest
            and os.path.splitext(f)[0] not in video_stems
        )
    ]
    if sort_by == "name":
        videos.sort()
    elif sort_by == "time":
        videos.sort(key=os.path.getmtime)
    elif sort_by == "size":
        videos.sort(key=os.path.getsize)
    if limit:
        videos = videos[:limit]

    stats: Dict = {
        "total": len(videos),
        "processed": 0,
        "skipped": 0,
        "failed": 0,
        "errors": {},
        "wall_seconds": 0.0,
        "media_seconds": 0.0,
    }
    throughput = Throughput()
    throughput.start()

    # Cross-video pipeline: while video N runs its device-bound engine stages
    # (towers, ASR sync, consolidation, replay) on THIS thread, video N+1's
    # host-bound extraction (libav decode) runs on a worker. The extraction
    # dispatches its own scan/ASR device programs from the worker; decode is
    # GIL-released C, so the two sides genuinely overlap even on one core.
    todo: List[Tuple[str, str, bool]] = []
    for path in videos:
        video_id = os.path.splitext(os.path.basename(path))[0]
        # skip-existing via video_index + existing events (reference :489-531)
        if skip_existing and mem.store.has_video(video_id) and mem.store.events_for_video(video_id):
            logger.info("skipping %s (already ingested)", video_id)
            stats["skipped"] += 1
            continue
        # long videos ingest chunk-by-chunk on the MAIN thread (the streaming
        # path pipelines within the video; its decode saturates the host, so
        # no cross-video lookahead runs concurrently). Already-extracted
        # videos (metadata.yaml) resume through the standard path instead.
        is_long = False
        if os.path.splitext(path)[1].lower() in VIDEO_EXTENSIONS and not os.path.exists(
            os.path.join(memory_store_dir, "frames", video_id, "metadata.yaml")
        ):
            try:
                from hippomm_tpu.media.io import open_video

                probe = open_video(path)
                is_long = (probe.info.duration or 0.0) > STREAMING_THRESHOLD_S
                probe.close()
            except Exception:
                pass
        todo.append((path, video_id, is_long))

    def _extract(path: str, video_id: str) -> Dict:
        return process_single_video(
            path, memory_store_dir, video_id,
            timers=getattr(mem, "timers", None), memory_system=mem,
        )

    lookahead_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def _submit(pos: int):
        if not pipeline_lookahead or todo[pos][2]:  # long videos stream inline
            return None
        return lookahead_pool.submit(_extract, todo[pos][0], todo[pos][1])

    next_fut = _submit(0) if todo else None

    for pos, (path, video_id, is_long) in enumerate(todo):
        t0 = time.perf_counter()
        frames = None  # re-bound per video: the except block below inspects it
        try:
            fut, next_fut = next_fut, None
            if is_long:
                result = process_single_video_streaming(
                    path, memory_store_dir, video_id, memory_system=mem
                )
                if pos + 1 < len(todo):
                    next_fut = _submit(pos + 1)
                frames = result["frames"]
            else:
                try:
                    extracted = fut.result() if fut is not None else _extract(path, video_id)
                finally:
                    # keep the lookahead alive even when this video's
                    # extraction failed — the NEXT video's decode should
                    # already be running
                    if pos + 1 < len(todo):
                        next_fut = _submit(pos + 1)
                mem.add_video(video_id, path)
                frames = extracted["frames"]
                audio = extracted["audio"]
                fssim = frames.get("frame_ssim")
                mem.process_sequence(
                    video_id,
                    frame_paths=frames.get("frame_paths", []),
                    frame_times=frames.get("frame_times", []),
                    frames_rgb=frames.get("frames_rgb"),
                    audio_data=audio.get("audio"),
                    video_duration=frames.get("duration"),
                    auto_consolidate=True,
                    frame_ssim=np.asarray(fssim, np.float32) if fssim is not None else None,
                    vision_stream=frames.get("vision_stream"),
                )
            stats["processed"] += 1
            stats["media_seconds"] += float(frames.get("duration") or 0.0)
            throughput.add_media(float(frames.get("duration") or 0.0))
            logger.info("%s done in %.2fs", video_id, time.perf_counter() - t0)
        except Exception as e:
            logger.exception("failed on %s", video_id)
            stats["failed"] += 1
            stats["errors"][video_id] = repr(e)
            # drop everything the failed video left in the engine (pending
            # ASR future, cached waveform/transcript, partial STMs/merge,
            # failed-attempt marker) — replay never ran, so the post-replay
            # eviction that keeps folder RSS flat never fired
            mem.discard_pending(video_id)
            # ...including an undrained vision prefetch (process_sequence
            # failed before consuming it): drop its device handles too
            vs = frames.get("vision_stream") if isinstance(frames, dict) else None
            if vs is not None and hasattr(vs, "close"):
                try:
                    vs.close()
                except Exception:  # noqa: BLE001 — already on the error path
                    pass
        # cadence over the videos actually being processed (pos), not the
        # pre-filter enumerate index — skip-existing interleaving would
        # otherwise leave long stretches of processed videos uncheckpointed
        if checkpoint_every and (pos + 1) % checkpoint_every == 0:
            _save_driver_checkpoint(mem, memory_store_dir, stats)
    lookahead_pool.shutdown(wait=False)
    throughput.stop()
    stats["wall_seconds"] = throughput.wall_seconds
    stats["realtime_multiple"] = throughput.realtime_multiple
    stats["engine"] = mem.get_stats()
    _save_driver_checkpoint(mem, memory_store_dir, stats)
    logger.info("batch complete: %s", json.dumps({k: v for k, v in stats.items() if k != "engine"}))
    return stats


def _save_driver_checkpoint(mem, store_dir: str, stats: Dict, keep_last: int = 3) -> None:
    """Driver checkpoints with keep-last-N rotation (reference :598-627)."""
    ckpt_dir = os.path.join(store_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    tag = f"driver_{int(time.time() * 1000)}"
    mem.save_short_term_buffer(tag)
    with open(os.path.join(ckpt_dir, f"{tag}_stats.json"), "w") as f:
        json.dump({k: v for k, v in stats.items() if k != "engine"}, f)
    drivers = sorted(
        fn for fn in os.listdir(ckpt_dir) if fn.startswith("driver_") and fn.endswith("_stats.json")
    )
    for old in drivers[:-keep_last]:
        base = old[: -len("_stats.json")]
        for suffix in ("_stats.json", ".json"):
            p = os.path.join(ckpt_dir, base + suffix)
            if os.path.exists(p):
                os.remove(p)


# ---------------------------------------------------------------------------
# Streaming consumer (the corrected process_memory_sync)
# ---------------------------------------------------------------------------


def process_memory_sync(
    memory_system,
    frame_queue: "queue.Queue",
    checkpoint_every: int = 64,
) -> Dict:
    """Queue-driven streaming ingest (reference: batch_process.py:666-747 —
    which calls a nonexistent consolidate_video_memories and drops video_id;
    this version works): items are
      {"type": "frame", "video_id", "path", "time"}
      {"type": "complete", "video_id"}   → flush + consolidate + replay
      {"type": "error", "video_id", "message"}
      {"type": "stop"}                    → drain and return stats
    """
    stats = {"frames": 0, "completed": [], "errors": {}}
    n_since_ckpt = 0
    while True:
        item = frame_queue.get()
        if item is None or item.get("type") == "stop":
            break
        kind = item.get("type")
        vid = item.get("video_id", "stream")
        if kind == "frame":
            memory_system.add_single_frame(vid, item["path"], item.get("time", 0.0))
            stats["frames"] += 1
            n_since_ckpt += 1
            if checkpoint_every and n_since_ckpt >= checkpoint_every:
                memory_system.save_short_term_buffer("stream")
                n_since_ckpt = 0
        elif kind == "complete":
            memory_system.flush_frame_buffer(vid)
            memory_system.consolidate(vid)
            memory_system.replay(vid)
            stats["completed"].append(vid)
        elif kind == "error":
            stats["errors"][vid] = item.get("message", "")
            logger.error("stream error for %s: %s", vid, item.get("message"))
    memory_system.save_short_term_buffer("stream")
    return stats


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def ingest_single_file(
    path: str,
    memory_store_dir: str,
    config: Optional[Config] = None,
    memory_system=None,
    skip_existing: bool = True,
) -> Dict:
    """Single-video ingest (reference :784-804) — shared by the CLI's
    single-file mode and the serving layer's /ingest (which passes its
    resident engine so new events are immediately searchable)."""
    from hippomm_tpu.memory.engine import HippocampalMemory

    config = config or load_config(None)
    config.storage.base_dir = memory_store_dir
    mem = memory_system or HippocampalMemory(config=config)
    video_id = os.path.splitext(os.path.basename(path))[0]
    if (
        skip_existing
        and mem.store.has_video(video_id)
        and mem.store.events_for_video(video_id)
    ):
        logger.info("skipping %s (already ingested)", video_id)
        return {
            "total": 1, "processed": 0, "skipped": 1, "failed": 0, "errors": {},
            "video_id": video_id, "wall_seconds": 0.0, "media_seconds": 0.0,
            "engine": mem.get_stats(),
        }
    t0 = time.perf_counter()
    try:
        extracted = process_single_video(
            path, memory_store_dir, video_id, timers=mem.timers, memory_system=mem
        )
        mem.add_video(video_id, path)
        frames, audio = extracted["frames"], extracted["audio"]
        fssim = frames.get("frame_ssim")
        mem.process_sequence(
            video_id,
            frame_paths=frames.get("frame_paths", []),
            frame_times=frames.get("frame_times", []),
            frames_rgb=frames.get("frames_rgb"),
            audio_data=audio.get("audio"),
            video_duration=frames.get("duration"),
            auto_consolidate=True,
            frame_ssim=np.asarray(fssim, np.float32) if fssim is not None else None,
            vision_stream=frames.get("vision_stream"),
        )
    except Exception:
        # same per-video purge as the folder driver: callers can hold a
        # LONG-LIVED engine (the serving layer's /ingest), so a failed
        # attempt must not leak its pending ASR future, cached waveform/
        # transcript, or partial STM/consolidated state
        mem.discard_pending(video_id)
        raise
    wall = time.perf_counter() - t0
    return {
        "total": 1, "processed": 1, "skipped": 0, "failed": 0, "errors": {},
        "video_id": video_id,
        "wall_seconds": wall,
        "media_seconds": float(frames.get("duration") or 0.0),
        "engine": mem.get_stats(),
    }


def main(argv: Optional[Sequence[str]] = None) -> Dict:
    """(reference: batch_process.py:749-826 — same flag surface: --path takes a
    single video file OR a folder; --skip-existing / --checkpoint-interval /
    --sort-by accepted verbatim)"""
    parser = argparse.ArgumentParser(description="hippomm-tpu batch video ingest")
    parser.add_argument(
        "--path", required=True,
        help="video file or folder of videos (.mp4/.mov/.mkv/.avi/.y4m/.webm)",
    )
    parser.add_argument("--memory_store", "--memory-store", default="memory_store")
    parser.add_argument("--config", default=None)
    parser.add_argument(
        "--sort", "--sort-by", dest="sort", choices=("name", "time", "size"), default="name"
    )
    parser.add_argument(
        "--checkpoint-every", "--checkpoint-interval", dest="checkpoint_every",
        type=int, default=5,
    )
    parser.add_argument("--limit", type=int, default=None)
    # reference flag (batch_process.py:758). Deviation: skipping already-
    # ingested videos is our DEFAULT (idempotent re-runs); --no-skip-existing
    # forces reprocessing.
    parser.add_argument("--skip-existing", dest="skip_existing", action="store_true", default=True)
    parser.add_argument("--no-skip-existing", dest="skip_existing", action="store_false")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
    config = load_config(args.config)
    config.storage.base_dir = args.memory_store

    if os.path.isfile(args.path):
        return ingest_single_file(
            args.path, args.memory_store, config=config,
            skip_existing=args.skip_existing,
        )

    return process_video_folder(
        args.path,
        args.memory_store,
        config=config,
        sort_by=args.sort,
        checkpoint_every=args.checkpoint_every,
        limit=args.limit,
        skip_existing=args.skip_existing,
    )


def cli() -> int:
    """Console-script entry: exit 0 when every video ingested, 1 otherwise
    (main() returns the stats dict, which sys.exit must not receive)."""
    stats = main()
    return 1 if stats.get("failed") else 0


if __name__ == "__main__":
    raise SystemExit(cli())
