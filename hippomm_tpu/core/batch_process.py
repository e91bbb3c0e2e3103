"""Ingestion pipeline + batch CLI (reference: hippomm/core/batch_process.py).

Same public surface — extract_frames_from_video (:116), extract_audio_from_video
(:257), process_single_video (:380), process_video_folder (:437),
process_memory_sync (:666), main (:749) — re-planned for TPU:

  * video decode via the C++ media shim (no cv2.VideoCapture python loop)
  * frame-difference key-framing as ONE batched device SSIM program over
    ~1 Hz candidates (the reference SSIMs pairs in Python every 30th frame)
  * silence detection as a device RMS reduction (no ffmpeg subprocess)
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
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hippomm_tpu.utils.device import fetch
import yaml

from hippomm_tpu.config import Config, load_config
from hippomm_tpu.utils.timers import Throughput

logger = logging.getLogger(__name__)

# reference set (batch_process.py:441) + our native fast-path containers
VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".y4m", ".webm", ".m4v")
# audio-only ingest (beyond the reference; driver bench config #2 shape:
# silence segmentation + Whisper + ImageBind audio embeddings, no frames)
AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".m4a", ".aac", ".ogg")
DECODE_BATCH = 64


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

    Idempotent: resumes from metadata.yaml when all frames exist (:137-149).
    """
    from hippomm_tpu.media.io import open_video
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

    sh, sw = score_hw
    reader = open_video(video_path)
    info = reader.info
    stride = max(1, int(round(info.fps * min_interval_s)))
    candidate_idx = list(range(0, info.num_frames, stride))
    times = [i / info.fps for i in candidate_idx]

    # --- single decode pass, interleaved with async device scoring ----------
    # Each candidate is decoded ONCE (C++ holds refcounted AVFrames; scoring
    # luma comes out eagerly, full RGB is converted lazily ONLY for the frames
    # the walk keeps — sws RGB conversion of every candidate costs more than
    # the decode itself). The greedy-walk scan for block i runs on device
    # WHILE the host decodes block i+1 (jax dispatch is async; the mask is
    # materialized one block late), so scoring hides inside the decode wall.
    # The old shape — a full luma pass, then a second re-decode pass for
    # selected RGB — paid the stream decode twice.
    from hippomm_tpu.ops.keyframe import KeyframeScanner

    # Big blocks: every feed is a host->device round trip, and on a tunneled
    # TPU per-dispatch latency (~0.3 s) dwarfs the scan compute — 256-candidate
    # blocks cost 3 round trips for a 10-min vlog instead of 19.
    from hippomm_tpu.ops.keyframe import BLOCK as SCAN_BLOCK

    block = SCAN_BLOCK
    scanner = KeyframeScanner(sh, sw, max_diff_threshold, min_interval_s, block=block)
    gray_blocks: List[np.ndarray] = []  # all candidate luma (tiny) — reused for
    # segmentation's adjacent-pair SSIM so nothing is recomputed downstream
    saved_rgb_parts: List[np.ndarray] = []
    saved_cand: List[int] = []
    from collections import deque

    pending: "deque" = deque()  # (cand_offset, device mask handle, held block)
    # Held blocks keep decoded frames alive (refcounted YUV in C++ / RGB array
    # in Python readers). Flushing is opportunistic — a mask may sit behind a
    # multi-second ASR program in the device queue (ASR is dispatched before
    # decode to overlap it), and blocking on it would stall the decoder. Cap
    # retained bytes so an unresponsive queue can't hold a whole video.
    held_frame_bytes = int(info.width * info.height * 1.6) * block
    max_hold = max(1, (512 << 20) // max(1, held_frame_bytes))

    def _flush(entry):
        off, handle, blk = entry
        mask = fetch(handle)
        js = np.nonzero(mask)[0]
        if len(js):
            saved_cand.extend(off + int(j) for j in js)
            saved_rgb_parts.append(blk.take_rgb(js))
        blk.close()

    with timers.stage("extract_decode"):
        for b0 in range(0, len(candidate_idx), block):
            batch = candidate_idx[b0 : b0 + block]
            with timers.stage("extract_decode_c"):
                # sparse candidates (high-fps sources at ~1 Hz cadence): skip
                # decoding non-reference frames between candidates entirely
                blk = reader.read_block(batch, sh, sw, skip_nonref=stride >= 8)
            gray_blocks.append(blk.gray)
            with timers.stage("extract_feed"):
                handle = scanner.feed(blk.gray, times[b0 : b0 + block])
            with timers.stage("extract_flush"):
                pending.append((b0, handle, blk))
                while pending and (len(pending) > max_hold or pending[0][1].is_ready()):
                    _flush(pending.popleft())
    with timers.stage("extract_score"):
        while pending:
            _flush(pending.popleft())
    reader.close()

    grays = (
        np.concatenate(gray_blocks) if gray_blocks else np.zeros((0, sh, sw), np.uint8)
    )
    saved_idx = [candidate_idx[j] for j in saved_cand]
    saved_times = [times[j] for j in saved_cand]
    saved_rgb = np.concatenate(saved_rgb_parts) if saved_rgb_parts else None

    # adjacent-pair SSIM over the SAVED frames' scoring luma — handed to
    # temporal pattern separation so it never re-resizes/re-scores RGB
    from hippomm_tpu.memory.segmentation import adjacent_similarity_gray

    with timers.stage("extract_seg_ssim"):
        frame_ssim = adjacent_similarity_gray(grays[saved_cand]) if saved_cand else None

    saved_paths: List[str] = []
    with timers.stage("extract_jpeg_save"):
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            futs = []
            for k, t in enumerate(saved_times):
                sec_dir = os.path.join(frames_dir, f"t_{int(t)}")
                path = os.path.join(sec_dir, f"frame_{k}.jpg")
                saved_paths.append(path)
                futs.append(pool.submit(save_frame, saved_rgb[k], path))
            for f in futs:
                f.result()

    meta = {
        "video_id": video_id,
        "video_path": video_path,
        "fps": info.fps,
        "duration": info.duration,
        "num_source_frames": info.num_frames,
        "frame_paths": saved_paths,
        "frame_times": [float(t) for t in saved_times],
        "frame_ssim": [float(s) for s in frame_ssim] if frame_ssim is not None else None,
    }
    os.makedirs(frames_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        yaml.safe_dump(meta, f)
    out = dict(meta)
    out["resumed"] = False
    if keep_rgb:
        out["frames_rgb"] = saved_rgb if saved_rgb is not None and len(saved_rgb) else None
    return out


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

    if os.path.exists(meta_path) and os.path.exists(npy_path):
        with open(meta_path) as f:
            meta = yaml.safe_load(f)
        meta["resumed"] = True
        meta["audio"] = np.load(npy_path)
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
            return {"video_id": video_id, "has_audio": False, "audio": None, "resumed": False}
        pcm = load_audio_mono16k(wav_path)
    frac = silence_fraction(pcm, 16000, silence_db)
    regions = detect_silence_regions(pcm, 16000, silence_db)
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
    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        f_frames = ex.submit(
            extract_frames_from_video, video_path, memory_store_dir, video_id, timers=timers
        )
        f_audio = ex.submit(extract_audio_from_video, video_path, memory_store_dir, video_id)
        audio = f_audio.result()
        # Overlap the ASR with frame decode by DISPATCHING it from this thread
        # (async device programs) and syncing later in process_sequence. A
        # worker-thread prefetch was measured to fight the single host core
        # and starve the extraction scan (10-min vlog: 19s -> 34s); eager
        # dispatch + late sync overlaps the same work with no second thread.
        if memory_system is not None and audio.get("audio") is not None:
            memory_system.dispatch_asr(video_id, audio["audio"])
        frames = f_frames.result()
    return {"video_id": video_id, "video_path": video_path, "frames": frames, "audio": audio}


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
    todo: List[Tuple[int, str, str]] = []
    for i, path in enumerate(videos):
        video_id = os.path.splitext(os.path.basename(path))[0]
        # skip-existing via video_index + existing events (reference :489-531)
        if skip_existing and mem.store.has_video(video_id) and mem.store.events_for_video(video_id):
            logger.info("skipping %s (already ingested)", video_id)
            stats["skipped"] += 1
            continue
        todo.append((i, path, video_id))

    def _extract(path: str, video_id: str) -> Dict:
        return process_single_video(
            path, memory_store_dir, video_id,
            timers=getattr(mem, "timers", None), memory_system=mem,
        )

    lookahead_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def _submit(pos: int):
        if not pipeline_lookahead:
            return None
        return lookahead_pool.submit(_extract, todo[pos][1], todo[pos][2])

    next_fut = _submit(0) if todo else None

    for pos, (i, path, video_id) in enumerate(todo):
        t0 = time.perf_counter()
        try:
            fut, next_fut = next_fut, None
            try:
                extracted = fut.result() if fut is not None else _extract(path, video_id)
            finally:
                # keep the lookahead alive even when this video's extraction
                # failed — the NEXT video's decode should already be running
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
            )
            stats["processed"] += 1
            stats["media_seconds"] += float(frames.get("duration") or 0.0)
            throughput.add_media(float(frames.get("duration") or 0.0))
            logger.info("%s done in %.2fs", video_id, time.perf_counter() - t0)
        except Exception as e:
            logger.exception("failed on %s", video_id)
            stats["failed"] += 1
            stats["errors"][video_id] = repr(e)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
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
        # single-video mode (reference :784-804)
        from hippomm_tpu.memory.engine import HippocampalMemory

        mem = HippocampalMemory(config=config)
        video_id = os.path.splitext(os.path.basename(args.path))[0]
        if (
            args.skip_existing
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
        extracted = process_single_video(
            args.path, args.memory_store, video_id, timers=mem.timers, memory_system=mem
        )
        mem.add_video(video_id, args.path)
        frames, audio = extracted["frames"], extracted["audio"]
        mem.process_sequence(
            video_id,
            frame_paths=frames.get("frame_paths", []),
            frame_times=frames.get("frame_times", []),
            frames_rgb=frames.get("frames_rgb"),
            audio_data=audio.get("audio"),
            video_duration=frames.get("duration"),
            auto_consolidate=True,
        )
        wall = time.perf_counter() - t0
        return {
            "total": 1, "processed": 1, "skipped": 0, "failed": 0, "errors": {},
            "video_id": video_id,
            "wall_seconds": wall,
            "media_seconds": float(frames.get("duration") or 0.0),
            "engine": mem.get_stats(),
        }

    return process_video_folder(
        args.path,
        args.memory_store,
        config=config,
        sort_by=args.sort,
        checkpoint_every=args.checkpoint_every,
        limit=args.limit,
        skip_existing=args.skip_existing,
    )


if __name__ == "__main__":
    main()
