"""End-to-end CLI test: synthetic videos → batch_process → ask_question,
hermetically (stub endpoints, tiny towers) — driver config #1/#3 shape."""

import json
import os

import numpy as np
import pytest
import yaml

from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    videos = root / "videos"
    videos.mkdir()
    for i, container in enumerate((".y4m", ".avi")):
        spec = SynthSpec(
            duration=30.0,
            fps=4.0,
            width=160,
            height=120,
            scene_changes=(14.0,),
            silence_regions=((13.5, 14.5), (25.0, 26.0)),
            seed=i,
        )
        write_synthetic_video(
            str(videos / f"clip{i}{container}"),
            spec,
            audio_path=str(videos / f"clip{i}.wav"),
        )
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "api": {"mode": "stub"},
                "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"},
            },
            f,
        )
    return root, str(videos), str(root / "store"), str(cfg_path)


@pytest.fixture(scope="module")
def ingested(workspace):
    from hippomm_tpu.core.batch_process import main as batch_main

    root, videos, store, cfg = workspace
    stats = batch_main(
        ["--path", videos, "--memory_store", store, "--config", cfg, "--checkpoint-every", "1"]
    )
    return workspace, stats


def test_batch_process_ingests_all(ingested):
    (root, videos, store, cfg), stats = ingested
    assert stats["processed"] == 2
    assert stats["failed"] == 0
    # store layout (reference-compatible tree)
    assert os.path.isdir(os.path.join(store, "frames", "clip0"))
    assert os.path.isfile(os.path.join(store, "audio", "clip0", "audio.npy"))
    assert os.path.isfile(os.path.join(store, "video_index.json"))
    events = os.listdir(os.path.join(store, "events", "clip0"))
    assert len(events) == 1
    with open(os.path.join(store, "events", "clip0", events[0])) as f:
        ev = json.load(f)
    assert np.asarray(ev["features"]["vision"]).shape[1] == 1024
    assert ev["summary"]


def test_batch_process_skips_already_ingested(ingested):
    from hippomm_tpu.core.batch_process import main as batch_main

    (root, videos, store, cfg), _ = ingested
    stats = batch_main(["--path", videos, "--memory_store", store, "--config", cfg])
    assert stats["skipped"] == 2
    assert stats["processed"] == 0


def test_ask_question_list(ingested, capsys):
    from hippomm_tpu.core.ask_question import main as ask_main

    (root, videos, store, cfg), _ = ingested
    rc = ask_main(["--memory-store", store, "--config", cfg, "--list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 event(s)" in out


def test_ask_question_event_inspect(ingested, capsys):
    from hippomm_tpu.core.ask_question import main as ask_main
    from hippomm_tpu.memory.store import MemoryStore

    (root, videos, store, cfg), _ = ingested
    eid = MemoryStore(store).list_events()[0]
    rc = ask_main(["--memory-store", store, "--config", cfg, "--event", eid])
    assert rc == 0
    assert "features[vision]" in capsys.readouterr().out


def test_ask_question_answers(ingested, capsys):
    from hippomm_tpu.core.ask_question import main as ask_main

    (root, videos, store, cfg), _ = ingested
    rc = ask_main(
        [
            "--memory-store", store, "--config", cfg,
            "--question", "What is the overall content of these videos?",
            "--json",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out)
    assert result["answer"]
    assert result["question_type"] == "SUMMARY"


def test_reference_namespace_imports():
    import hippomm.core.batch_process as bp
    import hippomm.core.ask_question as aq
    import hippomm.core.hippocampal_memory as hm
    import hippomm.models.foundation_models as fm
    import hippomm.utils.vector_ops as vo

    assert callable(bp.main) and callable(aq.main)
    assert hasattr(hm, "HippocampalMemory") and hasattr(hm, "ThetaEvent")
    assert hasattr(fm, "ImageBind") and hasattr(fm, "Whisper") and hasattr(fm, "QwenVL")
    assert callable(vo.top_k_cosine_similarity)


def test_streaming_consumer(ingested, tmp_path):
    import queue

    from hippomm_tpu.config import Config
    from hippomm_tpu.core.batch_process import process_memory_sync
    from hippomm_tpu.media.io import write_jpeg
    from hippomm_tpu.memory.engine import HippocampalMemory

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "stream_store")
    mem = HippocampalMemory(config=cfg)
    mem.frame_buffer_size = 4

    q = queue.Queue()
    rng = np.random.default_rng(0)
    for i in range(6):
        p = str(tmp_path / f"s{i}.jpg")
        write_jpeg(p, rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8))
        q.put({"type": "frame", "video_id": "stream1", "path": p, "time": float(i)})
    q.put({"type": "complete", "video_id": "stream1"})
    q.put({"type": "stop"})
    stats = process_memory_sync(mem, q, checkpoint_every=3)
    assert stats["frames"] == 6
    assert stats["completed"] == ["stream1"]
    assert len(mem.long_term_store) == 1


def test_single_file_ingest_and_reprocess_flags(tmp_path):
    """--path pointing at ONE video file (reference :784-804) and the
    --no-skip-existing reprocess override."""
    import numpy as np

    from hippomm_tpu.core.batch_process import main as batch_main
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

    video = tmp_path / "solo.mp4"
    write_synthetic_video(
        str(video),
        SynthSpec(duration=12.0, fps=4.0, width=160, height=120, scene_changes=(6.0,), seed=4),
    )
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"api": {"mode": "stub"}, "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"}},
            f,
        )
    store = str(tmp_path / "store")
    stats = batch_main(["--path", str(video), "--memory_store", store, "--config", str(cfg)])
    assert stats["processed"] == 1 and stats["video_id"] == "solo"
    assert os.path.isdir(os.path.join(store, "events", "solo"))

    # folder mode: skipped by default, reprocessed with --no-skip-existing
    stats2 = batch_main(["--path", str(tmp_path), "--memory_store", store, "--config", str(cfg)])
    assert stats2["skipped"] == 1
    stats3 = batch_main(
        ["--path", str(tmp_path), "--memory_store", store, "--config", str(cfg), "--no-skip-existing"]
    )
    assert stats3["processed"] == 1


def test_questions_file_batch(ingested, capsys, tmp_path):
    from hippomm_tpu.core.ask_question import main as ask_main

    (root, videos, store, cfg), _ = ingested
    qf = tmp_path / "qs.txt"
    qf.write_text(
        "What is the overall content?\nWhat color is the square?\nWhat sound plays?\n"
    )
    rc = ask_main(
        ["--memory-store", store, "--config", cfg, "--questions-file", str(qf), "--json"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 3
    assert all(item["answer"] for item in out)


def test_audio_only_ingest(tmp_path):
    """Driver bench config #2 shape: a bare audio file ingests through silence
    segmentation + ASR + ImageBind audio embeddings into an audio-only event."""
    import numpy as np

    from hippomm_tpu.core.batch_process import main as batch_main
    from hippomm_tpu.media.io import write_wav
    from hippomm_tpu.media.synth import SynthSpec, render_audio

    folder = tmp_path / "audio"
    folder.mkdir()
    spec = SynthSpec(duration=45.0, silence_regions=((20.0, 22.0),), seed=9)
    write_wav(str(folder / "podcast.wav"), render_audio(spec), 16000)
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"api": {"mode": "stub"}, "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"}},
            f,
        )
    store = str(tmp_path / "store")
    stats = batch_main(["--path", str(folder), "--memory_store", store, "--config", str(cfg)])
    assert stats["processed"] == 1 and stats["failed"] == 0
    events = os.listdir(os.path.join(store, "events", "podcast"))
    assert len(events) == 1
    with open(os.path.join(store, "events", "podcast", events[0])) as f:
        ev = json.load(f)
    assert "audio" in ev["features"] and "vision" not in ev["features"]
    assert ev["audio_transcription"]


def test_sibling_wav_not_double_ingested(tmp_path):
    """A .wav sharing a video's stem is its audio track, not a second item."""
    from hippomm_tpu.core.batch_process import main as batch_main
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

    folder = tmp_path / "mix"
    folder.mkdir()
    write_synthetic_video(
        str(folder / "clip.y4m"),
        SynthSpec(duration=12.0, fps=4.0, width=160, height=120, seed=2),
        audio_path=str(folder / "clip.wav"),
    )
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"api": {"mode": "stub"}, "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"}},
            f,
        )
    stats = batch_main(
        ["--path", str(folder), "--memory_store", str(tmp_path / "store"), "--config", str(cfg)]
    )
    assert stats["total"] == 1 and stats["processed"] == 1


def test_failed_video_accounted_and_rest_processed(tmp_path):
    """A corrupt container fails cleanly into stats.errors; the rest ingest."""
    from hippomm_tpu.core.batch_process import main as batch_main
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

    folder = tmp_path / "vids"
    folder.mkdir()
    write_synthetic_video(
        str(folder / "good.mp4"),
        SynthSpec(duration=10.0, fps=4.0, width=160, height=120, seed=1),
    )
    (folder / "bad.mp4").write_bytes(b"this is not a video at all" * 10)
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"api": {"mode": "stub"}, "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"}},
            f,
        )
    stats = batch_main(
        ["--path", str(folder), "--memory_store", str(tmp_path / "store"), "--config", str(cfg)]
    )
    assert stats["processed"] == 1
    assert stats["failed"] == 1
    assert "bad" in stats["errors"]


def test_single_file_skip_existing(tmp_path):
    from hippomm_tpu.core.batch_process import main as batch_main
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

    video = tmp_path / "again.mp4"
    write_synthetic_video(
        str(video), SynthSpec(duration=10.0, fps=4.0, width=160, height=120, seed=1)
    )
    cfg = tmp_path / "c.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"api": {"mode": "stub"}, "models": {"imagebind_variant": "tiny", "whisper_variant": "stub"}},
            f,
        )
    store = str(tmp_path / "store")
    s1 = batch_main(["--path", str(video), "--memory_store", store, "--config", str(cfg)])
    assert s1["processed"] == 1
    s2 = batch_main(["--path", str(video), "--memory_store", store, "--config", str(cfg)])
    assert s2["skipped"] == 1 and s2["processed"] == 0
    s3 = batch_main(
        ["--path", str(video), "--memory_store", store, "--config", str(cfg), "--no-skip-existing"]
    )
    assert s3["processed"] == 1


def test_folder_driver_survives_wedged_video(tmp_path):
    """A TimeoutError mid-engine (dead-transport read) fails THAT video,
    cleans its pending ASR future + cached track, and the folder batch
    continues to the next video."""
    from hippomm_tpu.config import Config
    from hippomm_tpu.core.batch_process import process_video_folder
    from hippomm_tpu.memory.engine import HippocampalMemory

    videos = tmp_path / "videos"
    videos.mkdir()
    for i in range(2):
        write_synthetic_video(
            str(videos / f"v{i}.avi"),
            SynthSpec(duration=12.0, fps=4.0, width=160, height=120, seed=i),
            audio_path=str(videos / f"v{i}.wav"),
        )
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    # the folder driver prefetches the vision encode through a stream during
    # extraction; the wedge (a dead-transport device read) surfaces at its
    # result() fetch inside process_sequence — the same mid-engine point the
    # old encode_vision call occupied
    real_stream = mem.imagebind.vision_stream
    state = {"fired": False}

    class _FlakyStream:
        def __init__(self, inner):
            self._inner = inner

        def feed(self, frames):
            self._inner.feed(frames)

        def result(self):
            if not state["fired"]:
                state["fired"] = True
                raise TimeoutError("device read wedged; transport appears down")
            return self._inner.result()

    mem.imagebind.vision_stream = lambda: _FlakyStream(real_stream())
    stats = process_video_folder(
        str(videos), cfg.storage.base_dir, config=cfg, memory_system=mem,
        checkpoint_every=0, pipeline_lookahead=False,
    )
    assert stats["processed"] == 1
    assert stats["failed"] == 1
    assert len(stats["errors"]) == 1
    assert not mem._asr_futures  # failed video's pending future was dropped
    assert len(mem.long_term_store) == 1  # the healthy video produced its event
    # NOTHING of either video lingers in the engine: the healthy one was
    # evicted after replay, the failed one by the per-video error cleanup —
    # folder-ingest RSS stays flat even across failures
    assert not mem.short_term_buffer
    assert not mem.consolidated
    assert not mem._full_audio
    assert not mem._full_transcript
    assert not mem._transcript_full_track


def test_vision_prefetch_candidate_encode_matches_direct(tmp_path):
    """Short clips encode ALL candidates during decode (encode_all_candidates
    fast path) and index down to the kept keyframes — the features the engine
    receives must equal encode_vision over the extractor's frames_rgb."""
    from hippomm_tpu.core.batch_process import extract_frames_from_video
    from hippomm_tpu.models.foundation import ImageBind

    video = tmp_path / "clip.mp4"
    write_synthetic_video(
        str(video),
        SynthSpec(duration=20.0, fps=2.0, width=160, height=120,
                  scene_changes=(6.0, 13.0), seed=3),
    )
    ib = ImageBind(variant="tiny")
    meta = extract_frames_from_video(
        str(video), str(tmp_path / "store"), vision_stream=ib.vision_stream()
    )
    stream = meta["vision_stream"]
    assert type(stream).__name__ == "_IndexedVisionStream"  # ≤64 candidates
    frames = meta["frames_rgb"]
    assert frames is not None and len(frames) >= 2
    got = stream.result()
    np.testing.assert_array_equal(got, ib.encode_vision(frames))


def test_vision_prefetch_keyframe_feed_matches_direct(tmp_path):
    """Longer clips (>64 candidates) skip the candidate fast path and feed
    only the KEPT keyframes as their scan mask flushes — the raw stream is
    attached unindexed and its rows must equal encode_vision(frames_rgb)."""
    from hippomm_tpu.core.batch_process import extract_frames_from_video
    from hippomm_tpu.models.foundation import ImageBind, VisionEncodeStream

    video = tmp_path / "clip.mp4"
    write_synthetic_video(
        str(video),
        SynthSpec(duration=140.0, fps=2.0, width=160, height=120,
                  scene_changes=(11.0, 40.0, 70.0, 100.0, 130.0), seed=5),
    )
    ib = ImageBind(variant="tiny")
    meta = extract_frames_from_video(
        str(video), str(tmp_path / "store"), vision_stream=ib.vision_stream()
    )
    stream = meta["vision_stream"]
    assert type(stream) is VisionEncodeStream  # 70 candidates > 64
    frames = meta["frames_rgb"]
    assert frames is not None and stream.frames_fed == len(frames)
    np.testing.assert_array_equal(stream.result(), ib.encode_vision(frames))


def test_vision_prefetch_mismatch_falls_back_to_encode(tmp_path):
    """A stream whose row count disagrees with frames_rgb (caller fed
    different frames) must be discarded — the engine re-encodes rather than
    mis-indexing features against frames."""
    from hippomm_tpu.config import Config
    from hippomm_tpu.memory.engine import HippocampalMemory

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    bad = mem.imagebind.vision_stream()
    bad.feed(frames[:2])  # 2 rows for 4 frames
    stms = mem.process_sequence(
        "v_mismatch",
        frame_paths=[f"f{i}.jpg" for i in range(4)],
        frame_times=[0.0, 1.0, 2.0, 3.0],
        frames_rgb=frames,
        audio_data=None,
        sample_rate=16000,
        video_duration=4.0,
        auto_consolidate=False,
        vision_stream=bad,
    )
    assert stms
    want = mem.imagebind.encode_vision(frames)
    got = np.concatenate([s.features["vision"] for s in stms])
    np.testing.assert_array_equal(got, want[: len(got)])


def test_vision_stream_close_paths(tmp_path):
    """ADVICE r3 #3: a stream abandoned on an error path must release its
    worker and dispatched handles. close() is idempotent, poisons further
    feeds, and the engine closes an attached stream when the video has no
    vision track to index."""
    from hippomm_tpu.config import Config
    from hippomm_tpu.memory.engine import HippocampalMemory
    from hippomm_tpu.models.foundation import ImageBind

    ib = ImageBind(variant="tiny")
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(40, 32, 32, 3)).astype(np.uint8)

    s = ib.vision_stream()
    s.feed(frames)  # dispatches one full 32-chunk on the worker
    s.close()
    s.close()  # idempotent
    assert s._handles == [] and s._pool is None and s._buffered == 0
    with pytest.raises(RuntimeError):
        s.feed(frames[:1])  # closed stream refuses new work
    assert s.result().shape == (0, 1024)  # drained-empty, not a crash

    # engine side: frames_rgb=None with an attached stream -> engine closes it
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)
    leak = mem.imagebind.vision_stream()
    leak.feed(frames)
    mem.process_sequence(
        "v_novision",
        frame_paths=[],
        frame_times=[],
        frames_rgb=None,
        audio_data=np.zeros(16000, np.float32),
        sample_rate=16000,
        video_duration=1.0,
        auto_consolidate=False,
        vision_stream=leak,
    )
    assert leak._handles == [] and leak._pool is None
