"""CI-sized QA-accuracy harness run (driver bench config #5 shape): synthetic
palette video, oracle model clients, real ingest + QA pipelines. Accuracy
measures retrieval localization — wrong windows give wrong colors/tones."""

import pytest

from hippomm_tpu.benchmarks.qa_harness import (
    OracleASR,
    OracleVLM,
    build_questions,
    run_harness,
    score_answer,
    tone_label,
    write_palette_video,
)


def test_qa_harness_end_to_end(tmp_path):
    out = run_harness(
        str(tmp_path),
        duration=90.0,
        scene_seconds=15.0,
        n_questions=8,
        imagebind_variant="tiny",
        width=160,
        height=120,
        negatives=False,
    )
    assert out["failed_videos"] == 0
    assert out["n_questions"] == 8
    # the oracle clients are deterministic; every question must localize
    assert out["qa_accuracy"] >= 0.85
    assert out["qa_accuracy_batched"] >= 0.85  # batched serving path too
    assert out["ingest_x"] > 0
    lo, hi = out["ci95"]
    assert lo <= out["qa_accuracy"] <= hi


def test_qa_harness_multivideo_with_negatives(tmp_path):
    """Two-video corpus (globally unique colors/tones) + distractor questions:
    retrieval must pick the right video AND decline absent content."""
    out = run_harness(
        str(tmp_path),
        duration=45.0,
        scene_seconds=15.0,
        n_questions=12,
        imagebind_variant="tiny",
        width=160,
        height=120,
        n_videos=2,
        negatives=True,
    )
    assert out["failed_videos"] == 0
    assert out["n_videos"] == 2 and out["n_scenes"] == 6
    assert set(out["accuracy_by_type"]) == {
        "video", "audio", "multimodal", "summary", "video_neg", "audio_neg"
    }
    assert out["qa_accuracy"] >= 0.85
    assert out["accuracy_by_type"]["video_neg"] == 1.0
    assert out["accuracy_by_type"]["audio_neg"] == 1.0


def test_oracle_asr_labels_tones(tmp_path):
    import numpy as np

    t = np.arange(16000 * 2) / 16000.0
    pcm = (0.3 * np.sin(2 * np.pi * 240.0 * t)).astype(np.float32)
    segs = OracleASR().transcribe(pcm)
    assert segs and all(s.text == tone_label(240.0) for s in segs)


def test_score_answer():
    truth = {"scenes": [(0.0, 15.0, "red", 200.0), (15.0, 30.0, "green", 240.0)]}
    q = {"type": "video", "color": "green"}
    assert score_answer(q, "ANSWER: 16.0 seconds", truth)
    assert not score_answer(q, "ANSWER: 5.0 seconds", truth)
    qa = {"type": "audio", "label": "tone240hz"}
    assert score_answer(qa, "heard tones: tone240hz", truth)
    assert not score_answer(qa, "heard tones: tone200hz", truth)
