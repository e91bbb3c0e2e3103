"""Chunked (streaming) long-video ingest vs the whole-video path.

The streaming path (core.batch_process.process_single_video_streaming /
extract_frames_streaming) must select the SAME key frames as a whole-video
pass (the greedy-walk carry spans chunk boundaries) and produce one ThetaEvent
covering the full duration with per-chunk transcripts stitched in global time.
"""

import os

import numpy as np
import pytest

from hippomm_tpu.config import Config
from hippomm_tpu.core.batch_process import (
    extract_frames_from_video,
    extract_frames_streaming,
    process_single_video_streaming,
)
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.memory.engine import HippocampalMemory

SPEC = SynthSpec(
    duration=75.0,
    fps=4.0,
    width=160,
    height=120,
    scene_changes=(20.0, 41.0, 62.0),
    silence_regions=((19.5, 20.5), (60.5, 61.5)),
    seed=11,
)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vid") / "long.mp4")
    write_synthetic_video(p, SPEC)
    return p


def _mk_engine(tmp_path_factory, tag):
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path_factory.mktemp(tag))
    return HippocampalMemory(config=cfg)


def test_streaming_selects_identical_keyframes(video_path, tmp_path_factory):
    whole_dir = str(tmp_path_factory.mktemp("whole"))
    stream_dir = str(tmp_path_factory.mktemp("stream"))
    whole = extract_frames_from_video(video_path, whole_dir, "v", keep_rgb=False)
    chunks = list(
        extract_frames_streaming(video_path, stream_dir, "v", emit_seconds=25.0)
    )
    assert len(chunks) >= 2  # actually chunked
    streamed_times = [t for c in chunks for t in c["frame_times"]]
    assert streamed_times == whole["frame_times"]
    # chunk boundaries tile the video
    ends = [c["chunk_start"] + c["chunk_duration"] for c in chunks]
    starts = [c["chunk_start"] for c in chunks]
    assert starts[0] == 0.0
    assert starts[1:] == ends[:-1]
    # every chunk's frames fall inside its window
    for c in chunks:
        for t in c["frame_times"]:
            assert c["chunk_start"] <= t < c["chunk_start"] + c["chunk_duration"] + 1e-6
    # metadata written identically to the whole pass
    import yaml

    with open(os.path.join(stream_dir, "frames", "v", "metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    assert meta["frame_times"] == whole["frame_times"]
    # whole-video mode reuses its single chunk's adjacent SSIM as the metadata
    # frame_ssim; streaming recomputes cross-chunk pairs — the two must be the
    # same quantity (guards the single-emit shortcut in extract_frames_streaming)
    np.testing.assert_allclose(
        np.asarray(whole["frame_ssim"], np.float32),
        np.asarray(meta["frame_ssim"], np.float32),
        rtol=0, atol=1e-5,
    )


def test_streaming_ingest_one_event_full_coverage(video_path, tmp_path_factory):
    mem = _mk_engine(tmp_path_factory, "stream_engine")
    result = process_single_video_streaming(
        video_path, mem.config.storage.base_dir, "long", memory_system=mem,
        chunk_seconds=25.0,
    )
    assert result["streamed"] and result["frames"]["streamed_chunks"] >= 2
    assert len(mem.long_term_store) == 1
    ev = mem.long_term_store[0]
    assert ev.video_id == "long"
    assert ev.start_time == 0.0
    assert ev.end_time == pytest.approx(SPEC.duration, abs=1.5)
    assert ev.features["vision"].shape[1] == 1024
    # every STM (pre-dedup) carries vision features; together they span the
    # video (replay evicted the in-memory buffer; the checkpoint persists)
    stms = mem.store.load_checkpoint("long")
    assert all("vision" in s.features and len(s.features["vision"]) for s in stms)
    assert stms[0].segment_info["start_time"] == 0.0
    assert stms[-1].segment_info["end_time"] == pytest.approx(SPEC.duration, abs=1.5)
    covered = sum(
        s.segment_info["end_time"] - s.segment_info["start_time"] for s in stms
    )
    assert covered == pytest.approx(SPEC.duration, abs=1.5)
    # per-chunk transcripts stitched in GLOBAL time, exactly once per chunk
    assert ev.audio_transcription
    assert ev.holistic_audio_transcription
    # STMs from chunk 2+ carry global (offset) times AND their own transcripts
    # (stub whisper has no async dispatch, so each chunk transcribes itself;
    # the full-track-reuse branch must NOT starve later chunks)
    stms2 = [s for s in stms if s.segment_info["start_time"] >= 25.0]
    assert stms2
    assert any(s.transcription for s in stms2)


def test_streaming_consumer_failure_unwinds_producer(video_path, tmp_path_factory):
    """A chunk-processing failure must propagate AND release the producer
    (blocked put), the decoder, and held frame blocks — no deadlock, no
    lingering threads (code-review finding: Queue(1) put with a dead reader)."""
    import threading
    import time

    mem = _mk_engine(tmp_path_factory, "fail_engine")
    calls = {"n": 0}
    orig = mem.process_sequence

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("synthetic chunk failure")
        return orig(*a, **k)

    mem.process_sequence = boom
    before = {t.ident for t in threading.enumerate()}
    with pytest.raises(RuntimeError, match="synthetic chunk failure"):
        process_single_video_streaming(
            video_path, mem.config.storage.base_dir, "failvid", memory_system=mem,
            chunk_seconds=25.0,
        )
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        extras = [
            t for t in threading.enumerate() if t.ident not in before and t.is_alive()
        ]
        if not extras:
            break
        time.sleep(0.1)
    assert not extras, f"producer machinery leaked threads: {extras}"


def test_streaming_retry_after_failure_does_not_duplicate_stms(
    video_path, tmp_path_factory
):
    """Same-process retry of a failed streaming ingest (ADVICE r1 medium):
    the failed attempt leaves chunk-0 STMs in short_term_buffer and a partial
    checkpoint on disk; the retry must start clean — chunk 0 of attempt 2
    would otherwise extend() onto them and the final ThetaEvent would carry
    every surviving segment twice."""
    mem = _mk_engine(tmp_path_factory, "retry_engine")
    calls = {"n": 0}
    orig = mem.process_sequence

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # chunk 0 succeeds (buffers STMs), chunk 1 dies
            raise RuntimeError("synthetic chunk failure")
        return orig(*a, **k)

    mem.process_sequence = boom
    with pytest.raises(RuntimeError, match="synthetic chunk failure"):
        process_single_video_streaming(
            video_path, mem.config.storage.base_dir, "retryvid",
            memory_system=mem, chunk_seconds=25.0,
        )
    assert mem.short_term_buffer.get("retryvid"), "chunk 0 STMs expected in buffer"
    mem.process_sequence = orig
    result = process_single_video_streaming(
        video_path, mem.config.storage.base_dir, "retryvid",
        memory_system=mem, chunk_seconds=25.0,
    )
    assert result["streamed"]
    assert len(mem.long_term_store) == 1
    stms = mem.store.load_checkpoint("retryvid")
    # non-overlapping, exactly-once coverage: duplicated chunk-0 segments
    # would push the summed span past the video duration
    covered = sum(
        s.segment_info["end_time"] - s.segment_info["start_time"] for s in stms
    )
    assert covered == pytest.approx(SPEC.duration, abs=1.5)
    starts = [s.segment_info["start_time"] for s in stms]
    assert len(starts) == len(set(starts)), "duplicated segment start times"


def test_folder_routes_long_videos_to_streaming(tmp_path_factory, monkeypatch):
    from hippomm_tpu.core import batch_process as bp

    folder = tmp_path_factory.mktemp("folder")
    p = str(folder / "longish.mp4")
    write_synthetic_video(p, SPEC)
    store = str(tmp_path_factory.mktemp("store"))
    monkeypatch.setattr(bp, "STREAMING_THRESHOLD_S", 50.0)
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = store
    mem = HippocampalMemory(config=cfg)
    stats = bp.process_video_folder(
        str(folder), store, config=cfg, memory_system=mem, checkpoint_every=0
    )
    assert stats["processed"] == 1 and stats["failed"] == 0
    assert len(mem.long_term_store) == 1
    # rerun skips (idempotent via video_index + events)
    stats2 = bp.process_video_folder(
        str(folder), store, config=cfg, memory_system=mem, checkpoint_every=0
    )
    assert stats2["skipped"] == 1
