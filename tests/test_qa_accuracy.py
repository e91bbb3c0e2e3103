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
        "video", "audio", "multimodal", "summary", "count", "xmodal", "order",
        "which_video", "video_neg", "audio_neg"
    }
    assert out["qa_accuracy"] >= 0.8
    assert out["accuracy_by_type"]["video_neg"] == 1.0
    assert out["accuracy_by_type"]["audio_neg"] == 1.0
    # cross-video aggregation: answerable only because multi-video recall
    # evidence is attributed to its source video
    assert out["accuracy_by_type"]["which_video"] == 1.0


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


def test_score_answer_hard_families():
    truth = {"scenes": [(0.0, 15.0, "red", 200.0), (15.0, 30.0, "green", 240.0)]}
    qo = {"type": "order", "pair": ["green", "red"], "expected": "red"}
    assert score_answer(qo, "red", truth)
    assert not score_answer(qo, "green", truth)
    assert not score_answer(qo, "not found", truth)
    qc = {"type": "count", "expected": 2}
    assert score_answer(qc, "2", truth)
    assert not score_answer(qc, "3", truth)
    assert not score_answer(qc, "several", truth)
    qx = {"type": "xmodal", "expected_yes": True, "color": "red", "label": "tone200hz"}
    assert score_answer(qx, "yes", truth)
    assert not score_answer(qx, "no (the background is green)", truth)
    assert not score_answer(qx, "unknown", truth)
    qxn = {"type": "xmodal", "expected_yes": False, "color": "green", "label": "tone200hz"}
    assert score_answer(qxn, "no (the background is red)", truth)
    assert not score_answer(qxn, "yes", truth)
    qw = {"type": "which_video", "pair": ["red", "green"],
          "expected": "palette00", "names": ["palette00", "palette01"]}
    assert score_answer(qw, "ANSWER: palette00", truth)
    assert not score_answer(qw, "ANSWER: palette01", truth)
    assert not score_answer(qw, "unknown", truth)
    # the FIRST named video is the claim; a later mention of the right name
    # doesn't rescue a wrong first claim
    assert not score_answer(qw, "palette01 (not palette00)", truth)


def test_build_questions_hard_families_and_empty_negatives():
    """Hard families are generated with oracle-checkable expectations, and a
    palette-saturating truth (no absent colors) degrades gracefully instead of
    raising IndexError (ADVICE r3 #4)."""
    from hippomm_tpu.benchmarks.qa_harness import PALETTE

    truth = {
        "scenes": [(0.0, 15.0, "red", 200.0), (15.0, 30.0, "green", 240.0),
                   (0.0, 15.0, "blue", 280.0), (15.0, 30.0, "yellow", 320.0)],
        "video_scenes": [
            [(0.0, 15.0, "red", 200.0), (15.0, 30.0, "green", 240.0)],
            [(0.0, 15.0, "blue", 280.0), (15.0, 30.0, "yellow", 320.0)],
        ],
    }
    qs = build_questions(truth, 27, seed=3, negatives=True)
    kinds = {q["type"] for q in qs}
    assert {"order", "count", "xmodal"} <= kinds
    # no video names in the truth -> cross-video questions can't be asked
    assert "which_video" not in kinds

    named = dict(truth, video_names=["vidA", "vidB"])
    qs_n = build_questions(named, 30, seed=3, negatives=True)
    wv = [q for q in qs_n if q["type"] == "which_video"]
    assert wv
    for q in wv:
        # both asked colors belong to the expected video's scene set
        vi = named["video_names"].index(q["expected"])
        colors = {c for _, _, c, _ in truth["video_scenes"][vi]}
        assert set(q["pair"]) <= colors
        assert q["names"] == ["vidA", "vidB"]
    for q in qs:
        if q["type"] == "order":
            # the expected color is the pair member whose scene starts earlier
            # WITHIN one video (cross-video times overlap)
            a, b = q["pair"]
            assert q["expected"] in (a, b)
            vid = next(v for v in truth["video_scenes"]
                       if {a, b} <= {c for _, _, c, _ in v})
            starts = {c: s for s, _, c, _ in vid}
            assert starts[q["expected"]] == min(starts[a], starts[b])
        elif q["type"] == "count":
            assert q["expected"] == 4
        elif q["type"] == "xmodal":
            scene = next(s for s in truth["scenes"]
                         if f"tone{int(s[3])}hz" == q["label"])
            assert q["expected_yes"] == (scene[2] == q["color"])

    # palette-saturating truth: every color used -> no video_neg, no crash
    full = {"scenes": [(float(i), float(i + 1), name, 200.0 + 40 * i)
                       for i, (name, _) in enumerate(PALETTE)]}
    qs2 = build_questions(full, 30, seed=0, negatives=True)
    assert all(q["type"] != "video_neg" for q in qs2)
    assert any(q["type"] == "audio_neg" for q in qs2)
    # xmodal yes/no balance must survive an EVEN kinds count (this config has
    # 8 kinds): a qi-parity rule gave every xmodal question the same answer,
    # letting a constant-'no' pipeline score 100% on the family
    xm = [q["expected_yes"] for q in qs2 if q["type"] == "xmodal"]
    assert len(xm) >= 2 and True in xm and False in xm
