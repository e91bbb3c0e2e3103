"""Dual-pathway retrieval tests (hermetic stub LLM + tiny ImageBind)."""

import numpy as np
import pytest

from hippomm_tpu.config import Config
from hippomm_tpu.media.synth import SynthSpec, generate
from hippomm_tpu.memory.engine import HippocampalMemory
from hippomm_tpu.retrieval.budget import (
    evenly_distribute_items,
    evenly_spaced_indices,
    truncate_text_to_tokens,
)
from hippomm_tpu.retrieval.qa import QARecallSystem
from hippomm_tpu.retrieval.search import FeatureSearchIndex, merge_windows


@pytest.fixture(scope="module")
def qa_env(tmp_path_factory):
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path_factory.mktemp("qa"))
    mem = HippocampalMemory(config=cfg)
    spec = SynthSpec(
        duration=40.0, fps=2.0, width=160, height=120,
        scene_changes=(18.0,), silence_regions=((17.5, 18.5),), seed=7,
    )
    res = generate(spec)
    mem.add_video("vidq", "")
    mem.process_sequence(
        "vidq",
        frame_paths=[f"f_{i}.jpg" for i in range(len(res.frames))],
        frame_times=res.frame_times,
        frames_rgb=res.frames,
        audio_data=res.audio,
    )
    qa = QARecallSystem(mem, cfg)
    return mem, qa


def test_summary_question_uses_fast_path(qa_env):
    _, qa = qa_env
    r = qa.answer_question("What is the overall summary of the video?")
    assert r.question_type == "SUMMARY"
    assert r.used_direct_answer
    assert r.answer


def test_video_question(qa_env):
    _, qa = qa_env
    r = qa.answer_question("What color is the moving square?")
    assert r.answer
    assert r.confidence > 0


def test_audio_question(qa_env):
    _, qa = qa_env
    r = qa.answer_question("What sound can be heard halfway through?")
    assert r.question_type == "AUDIO"
    assert r.answer


def test_classifier_types(qa_env):
    _, qa = qa_env
    assert qa._classify_question_type("What did the person say?") == "AUDIO"
    assert qa._classify_question_type("What is shown on screen?") == "VIDEO"


def test_search_index(qa_env):
    mem, _ = qa_env
    n = mem.long_term_store[0].features["vision"].shape[0]
    idx = FeatureSearchIndex.build(mem.long_term_store, "vision")
    assert len(idx) == n
    q = mem.long_term_store[0].features["vision"][0]
    hits = idx.search(q, top_k_per_event=5, global_top_k=3)
    assert len(hits) == min(3, n)
    assert hits[0].similarity > 0.999  # self-match first
    assert hits[0].index_in_event == 0


def test_search_per_event_cap(rng):
    from hippomm_tpu.memory.schema import ThetaEvent

    events = []
    base = rng.normal(size=1024).astype(np.float32)
    for vid in range(2):
        feats = base[None] + 0.01 * rng.normal(size=(10, 1024)).astype(np.float32)
        events.append(
            ThetaEvent(
                video_id=f"v{vid}",
                features={"vision": feats},
                feature_times={"vision": list(np.arange(10.0))},
                start_time=0.0,
                end_time=10.0,
            )
        )
    idx = FeatureSearchIndex.build(events, "vision")
    hits = idx.search(base, top_k_per_event=2, global_top_k=4)
    assert len(hits) == 4
    per = {}
    for h in hits:
        per[h.event_id] = per.get(h.event_id, 0) + 1
    assert max(per.values()) <= 2


def test_merge_windows():
    assert merge_windows([(0, 2), (3, 5), (10, 12)], gap=2.0) == [(0, 5), (10, 12)]
    assert merge_windows([], gap=2.0) == []


def test_budget_helpers():
    assert evenly_spaced_indices(10, 3) == [0, 4, 9]  # round-half-even midpoint
    items = [f"caption {i} " + "x" * 50 for i in range(100)]
    kept, sub = evenly_distribute_items(items, 200)
    assert sub and 1 <= len(kept) < 100
    assert kept[0] == items[0] and kept[-1] == items[-1]
    long = " ".join(["word"] * 10000)
    short = truncate_text_to_tokens(long, 100)
    assert "[…]" in short


def test_corner_case_on_empty_store(tmp_path):
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path)
    mem = HippocampalMemory(config=cfg)
    qa = QARecallSystem(mem, cfg)
    r = qa.answer_question("What happens?")
    assert r.confidence == 0.0
    assert "No memories" in r.answer


def test_qarecall_result_fields(qa_env):
    _, qa = qa_env
    r = qa.answer_question("What is shown in the scene at the start?")
    d = r.to_dict()
    for key in (
        "answer", "confidence", "reasoning", "retrieved_segments", "question_type",
        "used_direct_answer", "used_corner_case", "primary_modality",
        "segments_analyzed", "used_reflection",
    ):
        assert key in d


def test_search_overfetch_widens_until_global_k():
    """A store where one event dominates the similarity ranking must still
    return global_top_k survivors from other events (VERDICT r1 Weak #6)."""
    from hippomm_tpu.memory.schema import ThetaEvent

    rng = np.random.default_rng(0)
    q = rng.normal(size=1024).astype(np.float32)
    q /= np.linalg.norm(q)
    # event "hog": 100 rows almost identical to the query (out-ranks everything)
    hog = q[None] + 0.001 * rng.normal(size=(100, 1024)).astype(np.float32)
    # 5 other events, each 3 rows mildly similar
    events = [
        ThetaEvent(
            video_id="hog", features={"vision": hog},
            feature_times={"vision": list(np.arange(100.0))}, end_time=100.0,
        )
    ]
    for i in range(5):
        f = 0.3 * q[None] + rng.normal(size=(3, 1024)).astype(np.float32)
        events.append(
            ThetaEvent(
                video_id=f"v{i}", features={"vision": f},
                feature_times={"vision": [0.0, 1.0, 2.0]}, start_time=0.0, end_time=3.0,
            )
        )
    idx = FeatureSearchIndex.build(events, "vision")
    hits = idx.search(q, top_k_per_event=5, global_top_k=10)
    assert len(hits) == 10  # 5 from the hog + 5 from elsewhere
    assert len({h.event_id for h in hits}) >= 2
    assert sum(1 for h in hits if h.video_id == "hog") == 5


def test_speech_window_attribution_multivideo(tmp_path):
    """LLM-derived speech windows must attribute to the video whose transcript
    they overlap — not blanket events[0] (VERDICT r1 Weak #7)."""
    from hippomm_tpu.memory.schema import ThetaEvent

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)
    ev_a = ThetaEvent(
        video_id="vidA", start_time=0.0, end_time=30.0,
        audio_transcription=["hello from A"], audio_times=[5.0],
    )
    ev_b = ThetaEvent(
        video_id="vidB", start_time=0.0, end_time=30.0,
        audio_transcription=["greetings from B"], audio_times=[20.0],
    )
    mem.long_term_store = [ev_a, ev_b]
    qa = QARecallSystem(mem, cfg)

    class FixedWindows:
        def chat(self, messages, max_tokens=128, **kw):
            text = messages[-1]["content"]
            if "JSON list" in text:
                return '[{"start_time": 19.0, "end_time": 22.0}]'
            return "ANSWER: ok\nCONFIDENCE: 0.9"

        def caption_images(self, jpegs, prompt):
            return ["cap"] * len(jpegs)

    qa.reasoning = FixedWindows()
    frames = qa._speech_timeframes("What was said near the end?")
    assert len(frames) == 1
    s, e, vid = frames[0]
    assert vid == "vidB"  # window 17-24 s overlaps vidB's transcript at 20 s


def test_reflection_arbitration_includes_transcripts(qa_env):
    """The disagree-arbitration prompt must carry transcription context
    (reference hippocampal_memory.py:1790-1860)."""
    mem, _ = qa_env
    qa = QARecallSystem(mem, mem.config)
    prompts = []

    class Recorder:
        def chat(self, messages, max_tokens=128, **kw):
            text = messages[-1]["content"]
            prompts.append(text)
            if "Reply YES or NO" in text:
                return "NO"
            return "B: the detailed answer"

        def caption_images(self, jpegs, prompt):
            return ["cap"] * len(jpegs)

    qa.reasoning = Recorder()
    from hippomm_tpu.memory.schema import QARecallResult

    detailed = QARecallResult(answer="detailed", confidence=0.5)
    out = qa._reflect_on_answer("q?", "direct", 0.8, detailed)
    assert out.used_reflection
    arb = [p for p in prompts if "pick the better one" in p]
    assert arb and "Context transcriptions:" in arb[0]


def test_search_batch_matches_single(qa_env):
    mem, _ = qa_env
    idx = FeatureSearchIndex.build(mem.long_term_store, "vision")
    rng = np.random.default_rng(4)
    queries = rng.normal(size=(5, 1024)).astype(np.float32)
    batch = idx.search_batch(queries, top_k_per_event=3, global_top_k=3)
    for qi, hits in enumerate(batch):
        single = idx.search(queries[qi], top_k_per_event=3, global_top_k=3)
        assert [(h.event_id, h.index_in_event) for h in hits] == [
            (h.event_id, h.index_in_event) for h in single
        ]
        assert [h.similarity for h in hits] == pytest.approx(
            [h.similarity for h in single], abs=1e-5
        )


def test_audio_routing_is_llm_not_regex(qa_env):
    """Speech-vs-sound routing for AUDIO questions comes from the LLM's
    primary-modality verdict (reference hippocampal_memory.py:1684-1686), not
    a keyword regex — 'what melody plays?' has no speech keywords and must
    still take the sound path."""
    _, qa = qa_env
    r = qa._process_audio_query("What melody plays in the background?")
    assert r.primary_modality == "sound"
    r2 = qa._process_audio_query("What did the person say about the plan?")
    assert r2.primary_modality == "speech"


def test_recall_dedup_gate_static_scene(tmp_path):
    """Window re-decode keeps a frame only when SSIM vs the last KEPT frame is
    <= 0.3 (reference hippocampal_memory.py:2236-2239): a static-scene window
    contributes exactly one frame regardless of its length."""
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)
    video = str(tmp_path / "static.mp4")
    write_synthetic_video(
        video, SynthSpec(duration=10.0, fps=4.0, width=160, height=120, seed=5)
    )
    mem.store.add_video("static", video)
    qa = QARecallSystem(mem, cfg)
    jpegs, times = qa._frames_for_windows("static", [(1.0, 7.0)])
    assert len(jpegs) == 1  # 7 decoded candidates, one visually distinct moment
    assert times[0] == 1.0


def test_answer_questions_batched_matches_serial(qa_env):
    mem, qa = qa_env
    questions = [
        "What is the overall summary of the video?",
        "What color is the moving square?",
        "What sound can be heard halfway through?",
    ]
    batched = qa.answer_questions(questions)
    serial = [qa.answer_question(q) for q in questions]
    assert len(batched) == 3
    for b, s in zip(batched, serial):
        assert b.question_type == s.question_type
        assert b.answer == s.answer
        assert b.used_direct_answer == s.used_direct_answer


def test_classifier_parses_compound_label(qa_env):
    """An LLM reply of 'VIDEO+AUDIO' must classify as VIDEO+AUDIO — the
    substring 'VIDEO' must not swallow it (bug found by the QA harness)."""
    _, qa = qa_env

    class Fixed:
        def __init__(self, reply):
            self.reply = reply

        def chat(self, messages, max_tokens=8, **kw):
            return self.reply

    orig = qa.reasoning
    try:
        for reply, want in (
            ("VIDEO+AUDIO", "VIDEO+AUDIO"),
            ("video + audio", "VIDEO+AUDIO"),
            ("VIDEO", "VIDEO"),
            ("AUDIO", "AUDIO"),
            ("SUMMARY", "SUMMARY"),
        ):
            qa.reasoning = Fixed(reply)
            assert qa._classify_question_type("q?") == want, reply
    finally:
        qa.reasoning = orig


def test_frames_fallback_to_stored_keyframes_on_decode_failure(tmp_path):
    """If the source mp4 can no longer be decoded (moved/corrupt after
    ingest), detailed-recall windows degrade to the nearest stored keyframe
    instead of returning zero frames (approximate captions beat an empty
    retrieval)."""
    from hippomm_tpu.media.io import write_jpeg
    from hippomm_tpu.memory.schema import ThetaEvent

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    rng = np.random.default_rng(3)
    kf_paths = []
    for i in range(2):
        p = str(tmp_path / f"kf_{i}.jpg")
        write_jpeg(p, rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8))
        kf_paths.append(p)
    ev = ThetaEvent(
        video_id="gone", start_time=0.0, end_time=30.0,
        frames=kf_paths, frame_times=[5.0, 20.0],
    )
    mem.long_term_store = [ev]
    # path registered at ingest time, but the file no longer exists
    mem.store.add_video("gone", str(tmp_path / "moved_away.mp4"))
    qa = QARecallSystem(mem, cfg)

    # window BEFORE the first stored keyframe (forward coverage can't reach
    # it): samples plan as mp4 decodes, the decode fails, and the nearest
    # keyframe (t=5.0) substitutes once
    jpegs, times = qa._frames_for_windows("gone", [(0.0, 2.0)])
    assert len(jpegs) == 1
    assert times == [5.0]

    # window after a keyframe never touches the (missing) mp4: the
    # at-or-before keyframe covers until the next save, reported at the
    # window's own sample time
    jpegs2, times2 = qa._frames_for_windows("gone", [(10.0, 12.0)])
    assert len(jpegs2) == 1
    assert times2 == [10.0]


def test_topk_host_route_matches_device(rng=None):
    """The measured-latency router's host path returns the same hits as the
    device program (HIPPOMM_TOPK_ROUTE pins each)."""
    import os

    rng = np.random.default_rng(11)
    from hippomm_tpu.memory.schema import ThetaEvent

    events = [
        ThetaEvent(
            video_id=f"v{i}",
            features={"vision": rng.normal(size=(20, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(20.0))},
            end_time=20.0,
        )
        for i in range(30)
    ]
    index = FeatureSearchIndex.build(events, "vision")
    qs = rng.normal(size=(4, 1024)).astype(np.float32)
    try:
        os.environ["HIPPOMM_TOPK_ROUTE"] = "device"
        dev = [index.search(q, top_k_per_event=5, global_top_k=5) for q in qs]
        dev_b = index.search_batch(qs, top_k_per_event=5, global_top_k=5)
        os.environ["HIPPOMM_TOPK_ROUTE"] = "host"
        host = [index.search(q, top_k_per_event=5, global_top_k=5) for q in qs]
        host_b = index.search_batch(qs, top_k_per_event=5, global_top_k=5)
    finally:
        del os.environ["HIPPOMM_TOPK_ROUTE"]
    for a, b in zip(dev + dev_b, host + host_b):
        assert [h.event_id for h in a] == [h.event_id for h in b]
        assert [h.index_in_event for h in a] == [h.index_in_event for h in b]
        np.testing.assert_allclose(
            [h.similarity for h in a], [h.similarity for h in b], atol=1e-5
        )


def test_topk_device_path_uses_prenorm_kernel(monkeypatch):
    """The device route must call the PRENORM kernels over the once-normalized
    store (ADVICE r3 medium: _device_feats pre-normalizes, but the route was
    still paying per-query store normalization via top_k_cosine_packed —
    the measured 3.7→1.3 ms HBM win never reached production)."""
    import os

    import hippomm_tpu.ops.similarity as sim
    from hippomm_tpu.memory.schema import ThetaEvent

    rng = np.random.default_rng(12)
    events = [
        ThetaEvent(
            video_id=f"v{i}",
            features={"vision": rng.normal(size=(8, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(8.0))},
            end_time=8.0,
        )
        for i in range(4)
    ]
    index = FeatureSearchIndex.build(events, "vision")
    calls = {"prenorm": 0, "renorm": 0}
    real = sim.top_k_cosine_packed_prenorm
    monkeypatch.setattr(
        sim, "top_k_cosine_packed_prenorm",
        lambda *a, **k: (calls.__setitem__("prenorm", calls["prenorm"] + 1), real(*a, **k))[1],
    )
    monkeypatch.setattr(
        sim, "top_k_cosine_packed",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("re-normalizing kernel on device route")),
    )
    monkeypatch.setenv("HIPPOMM_TOPK_ROUTE", "device")
    hits = index.search(rng.normal(size=1024).astype(np.float32), 5, 5)
    index.search_batch(rng.normal(size=(2, 1024)).astype(np.float32), 5, 5)
    assert hits and calls["prenorm"] >= 2


def test_topk_router_adapts_to_measured_latency():
    """Routing converges to the faster backend and periodically re-probes the
    slower one so it can recover."""
    rng = np.random.default_rng(12)
    from hippomm_tpu.memory.schema import ThetaEvent

    events = [
        ThetaEvent(
            video_id="v0",
            features={"vision": rng.normal(size=(50, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(50.0))},
            end_time=50.0,
        )
    ]
    index = FeatureSearchIndex.build(events, "vision")
    # pretend the device path is pathologically slow (wedged transport)
    index._lat = {"host": 0.003, "device": 5.0}
    index._n_queries = 1
    routes = []
    for _ in range(FeatureSearchIndex.PROBE_EVERY + 2):
        index._n_queries += 1
        routes.append(index._route())
    assert routes.count("host") >= FeatureSearchIndex.PROBE_EVERY - 1
    assert "device" in routes  # the slower path still gets re-probed
    # transport heals: a fast device probe flips routing immediately
    index._note_latency("device", 0.0005)
    index._n_queries += 1
    assert index._route() == "device"


def test_topk_device_timeout_falls_back_to_host(monkeypatch):
    """A wedged-transport TimeoutError on the routed/probed device path serves
    the query from host numpy and records the giant device latency, instead of
    crashing the question (review finding r2)."""
    rng = np.random.default_rng(13)
    from hippomm_tpu.memory.schema import ThetaEvent

    events = [
        ThetaEvent(
            video_id="v0",
            features={"vision": rng.normal(size=(40, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(40.0))},
            end_time=40.0,
        )
    ]
    index = FeatureSearchIndex.build(events, "vision")
    host_hits = index.search(rng.normal(size=1024).astype(np.float32), global_top_k=3)
    assert host_hits

    def wedge(self, q, k):
        raise TimeoutError("transport down")

    monkeypatch.setattr(FeatureSearchIndex, "_topk_device", wedge)
    monkeypatch.setattr(
        FeatureSearchIndex, "_topk_batch_device", lambda self, q, k: wedge(self, q, k)
    )
    # force routing onto the (wedged) device path
    index._lat = {"host": 0.003, "device": 0.0001}
    q = rng.normal(size=1024).astype(np.float32)
    hits = index.search(q, global_top_k=3)
    assert hits and all(np.isfinite(h.similarity) for h in hits)
    bhits = index.search_batch(np.stack([q, q]), global_top_k=3)
    assert len(bhits) == 2 and all(bhits)
    # the timeout was recorded as a (huge) device latency -> routing flips back
    assert index._lat["device"] > index._lat["host"]


def test_gather_transcripts_legacy_store_spans(tmp_path):
    """Legacy events (flat holistic string + per-segment string-list
    transcriptions) localize speech via the per-segment entries, with missing
    ends running to the next snippet's start / event end (review findings r2)."""
    from hippomm_tpu.memory.schema import ThetaEvent
    from hippomm_tpu.retrieval.qa import QARecallSystem

    ev = ThetaEvent(
        video_id="legacy",
        features={},
        audio_transcription=["first part", "second part", "third part"],
        audio_times=[0.0, 12.0, 25.0],
        holistic_audio_transcription="first part second part third part",
        start_time=0.0,
        end_time=30.0,
    )
    class _Mem:
        long_term_store = [ev]

    qa = QARecallSystem.__new__(QARecallSystem)
    qa.memory = _Mem()
    snippets = qa._gather_transcripts()
    # per-segment entries win over the single whole-span legacy holistic entry
    assert [s[2] for s in snippets] == ["first part", "second part", "third part"]
    # ends run to the next snippet / the event end — not start+5
    assert [(s[0], s[1]) for s in snippets] == [(0.0, 12.0), (12.0, 25.0), (25.0, 30.0)]

    # a NEW-format store (sentence-level holistic entries with real times)
    # still prefers holistic — the finest granularity
    ev2 = ThetaEvent(
        video_id="new",
        features={},
        audio_transcription=[{"text": "whole segment", "start": 0.0, "end": 28.0}],
        holistic_audio_transcription=[
            {"text": "hello", "start": 1.0, "end": 3.0},
            {"text": "world", "start": 9.0, "end": 11.5},
        ],
        start_time=0.0,
        end_time=28.0,
    )
    qa.memory.long_term_store = [ev2]
    snippets = qa._gather_transcripts()
    assert [s[2] for s in snippets] == ["hello", "world"]
    assert snippets[0][:2] == (1.0, 3.0) and snippets[1][:2] == (9.0, 11.5)


def test_keyframe_substitution_is_direction_aware(tmp_path):
    """A keyframe at-or-before the sample covers it for a full sample period
    (content persists until the next save); a LATER keyframe — which often
    marks a cut — only covers grid jitter (half a period). The pre-cut sample
    must decode from the mp4, not reuse the post-cut keyframe JPEG."""
    from hippomm_tpu.media.io import jpeg_decode, write_jpeg
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
    from hippomm_tpu.memory.schema import ThetaEvent

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    # video with a hard cut at t=5 (scene colors differ either side)
    vid = str(tmp_path / "cut.mp4")
    write_synthetic_video(
        vid, SynthSpec(duration=10.0, fps=2.0, width=160, height=120,
                       scene_changes=(5.0,), seed=7)
    )
    # stored keyframes: t=0 (pre-cut) and t=5 (the cut frame)
    from hippomm_tpu.media.io import open_video

    r = open_video(vid)
    f0 = r.read_rgb([0])[0]
    f5 = r.read_rgb([10])[0]
    r.close()
    p0, p5 = str(tmp_path / "kf0.jpg"), str(tmp_path / "kf5.jpg")
    write_jpeg(p0, f0)
    write_jpeg(p5, f5)
    ev = ThetaEvent(
        video_id="cut", start_time=0.0, end_time=10.0,
        frames=[p0, p5], frame_times=[0.0, 5.0],
    )
    mem.long_term_store = [ev]
    mem.store.add_video("cut", vid)
    qa = QARecallSystem(mem, cfg)

    jpegs, times = qa._frames_for_windows("cut", [(4.0, 6.0)])
    by_t = {round(t): jpeg_decode(j) for j, t in zip(jpegs, times)}
    # the pre-cut sample must be present (the old backward substitution
    # collapsed it into the post-cut keyframe, losing t=4 entirely)
    assert 4 in by_t, sorted(by_t)
    # and it must show PRE-cut content: recall frames are 320x180 resizes,
    # so compare scene signatures (per-channel means) against either side
    def sig(a):
        return a.reshape(-1, 3).mean(axis=0)

    d_pre = np.abs(sig(by_t[4]) - sig(f0)).mean()
    d_post = np.abs(sig(by_t[4]) - sig(f5)).mean()
    assert d_pre < d_post, (d_pre, d_post)
    if 5 in by_t:  # post-cut sample rides the stored keyframe (may dedup away)
        assert np.abs(sig(by_t[5]) - sig(f5)).mean() < 3.0


def test_device_probe_backoff_during_outage():
    """Each device probe that times out doubles the probe interval (a failed
    probe costs DEVICE_PROBE_GIVE_UP_S of real query latency — a fixed cadence
    would stall every 32nd query for ~15 s through a whole outage), and one
    successful device run resets the cadence."""
    rng = np.random.default_rng(21)
    from hippomm_tpu.memory.schema import ThetaEvent

    events = [
        ThetaEvent(
            video_id="v0",
            features={"vision": rng.normal(size=(30, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(30.0))},
            end_time=30.0,
        )
    ]
    index = FeatureSearchIndex.build(events, "vision")
    index._lat = {"host": 0.003, "device": 20.0}  # routed host, device wedged
    calls = {"n": 0}

    def wedge(q, k):
        calls["n"] += 1
        raise TimeoutError("transport down")

    index._topk_device = wedge
    q = rng.normal(size=1024).astype(np.float32)
    base = FeatureSearchIndex.PROBE_EVERY
    # run enough queries for several fixed-cadence probe points; with backoff
    # only log2-many actually hit the device
    index._n_queries = 0
    for _ in range(base * 8):
        index._topk(q, 5)
    assert calls["n"] <= 4  # fixed cadence would have probed 8 times
    assert index._device_probe_every > base
    # transport heals: next probe succeeds and resets the cadence
    index._topk_device = lambda q, k: index._topk_host(q, k)
    index._n_queries = index._device_probe_every - 1
    index._topk(q, 5)  # this one probes the device path and succeeds
    assert index._device_probe_every == base


def test_fallback_keyframe_not_duplicated_with_jpg_plan(tmp_path):
    """When one window sample is served from a stored keyframe JPEG and a
    later sample's mp4 decode fails, the decode-failure fallback must not
    re-emit that same keyframe as a second identically-timestamped frame."""
    from hippomm_tpu.media.io import write_jpeg
    from hippomm_tpu.memory.schema import ThetaEvent

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    rng = np.random.default_rng(9)
    kf_paths = []
    for i in range(2):
        p = str(tmp_path / f"kf_{i}.jpg")
        write_jpeg(p, rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8))
        kf_paths.append(p)
    ev = ThetaEvent(
        video_id="gone2", start_time=0.0, end_time=30.0,
        frames=kf_paths, frame_times=[2.0, 20.0],
    )
    mem.long_term_store = [ev]
    mem.store.add_video("gone2", str(tmp_path / "moved_away.mp4"))
    qa = QARecallSystem(mem, cfg)

    # sample at 2.0 is jpg-planned from kf_0; samples at 5-6 plan as mp4
    # decodes, the decode fails, and their nearest keyframe IS kf_0 again —
    # it must be skipped (already consumed), leaving kf_1 for nothing
    jpegs, times = qa._frames_for_windows("gone2", [(2.0, 2.0), (5.0, 6.0)])
    assert times == [2.0]
    assert len(jpegs) == 1


def test_keyframe_substitution_nearest_wins_in_overlap(tmp_path):
    """When a sample is covered by BOTH the at-or-before keyframe (full-period
    tolerance) and a later one (half-period tolerance), the NEARER keyframe
    wins: a spacing-suppressed cut between two saves ~1 period apart can sit
    anywhere between them, and a sample 0.1s before the later save is on its
    side of the cut far more often than on the earlier save's (review r2: the
    forward branch unconditionally rode the stale pre-cut JPEG)."""
    from hippomm_tpu.media.io import jpeg_decode, write_jpeg
    from hippomm_tpu.memory.schema import ThetaEvent

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)

    red = np.zeros((120, 160, 3), np.uint8); red[..., 0] = 200
    blue = np.zeros((120, 160, 3), np.uint8); blue[..., 2] = 200
    pa, pb = str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")
    write_jpeg(pa, red)
    write_jpeg(pb, blue)
    ev = ThetaEvent(
        video_id="ovl", start_time=0.0, end_time=20.0,
        frames=[pa, pb], frame_times=[10.0, 11.0],
    )
    mem.long_term_store = [ev]
    # no source mp4 on disk is irrelevant here: both samples are jpg-planned
    mem.store.add_video("ovl", str(tmp_path / "missing.mp4"))
    qa = QARecallSystem(mem, cfg)

    # sample at 10.9: covered by a@10.0 (0.9 <= fwd_tol 1.0) AND b@11.0
    # (0.1 <= back_tol 0.5) — must ride the NEARER post-save b (blue)
    jpegs, times = qa._frames_for_windows("ovl", [(10.9, 10.9)])
    assert len(jpegs) == 1
    img = jpeg_decode(jpegs[0])
    assert img[..., 2].mean() > img[..., 0].mean(), "picked the stale pre-cut JPEG"

    # sample at 10.2: both qualify? b is 0.8 ahead (> back_tol) — forward-only
    # coverage still rides a (red), unchanged semantics
    jpegs2, _ = qa._frames_for_windows("ovl", [(10.2, 10.2)])
    img2 = jpeg_decode(jpegs2[0])
    assert img2[..., 0].mean() > img2[..., 2].mean()


def test_topk_device_raise_falls_back_to_host(monkeypatch):
    """A transport that fails by RAISING (observed: backend Unavailable after
    a long hang) — not by wedging — must also land on the host fallback with
    the probe cadence backed off (review finding r2 pass 2)."""
    rng = np.random.default_rng(14)
    from hippomm_tpu.memory.schema import ThetaEvent

    events = [
        ThetaEvent(
            video_id="v0",
            features={"vision": rng.normal(size=(40, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(40.0))},
            end_time=40.0,
        )
    ]
    index = FeatureSearchIndex.build(events, "vision")

    def unavailable(self, q, k):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(FeatureSearchIndex, "_topk_device", unavailable)
    monkeypatch.setattr(
        FeatureSearchIndex, "_topk_batch_device",
        lambda self, q, k: unavailable(self, q, k),
    )
    index._lat = {"host": 0.003, "device": 0.0001}
    before = index._device_probe_every
    q = rng.normal(size=1024).astype(np.float32)
    hits = index.search(q, global_top_k=3)
    assert hits and all(np.isfinite(h.similarity) for h in hits)
    bhits = index.search_batch(np.stack([q, q]), global_top_k=3)
    assert len(bhits) == 2 and all(bhits)
    assert index._lat["device"] > index._lat["host"]
    assert index._device_probe_every > before  # backoff engaged


def test_index_cache_invalidates_under_eviction():
    """max_long_term eviction keeps len(long_term_store) CONSTANT while the
    content churns — a length-keyed cache served evicted events forever in a
    resident server (review finding r2)."""
    import types

    from hippomm_tpu.config import Config
    from hippomm_tpu.memory.schema import ThetaEvent
    from hippomm_tpu.retrieval.qa import QARecallSystem

    rng = np.random.default_rng(21)

    def ev(i):
        return ThetaEvent(
            video_id=f"v{i}",
            features={"vision": rng.normal(size=(4, 1024)).astype(np.float32)},
            feature_times={"vision": [0.0, 1.0, 2.0, 3.0]},
            start_time=0.0,
            end_time=4.0,
        )

    cfg = Config()
    cfg.api.mode = "stub"
    mem = types.SimpleNamespace(
        long_term_store=[ev(0), ev(1)], mesh=None, config=cfg
    )
    qa = QARecallSystem(mem, cfg)
    idx1 = qa._index("vision")
    assert "v0" in idx1.videos

    # evict-oldest + append: SAME length, different content
    mem.long_term_store = [mem.long_term_store[1], ev(2)]
    idx2 = qa._index("vision")
    assert idx2 is not idx1
    assert "v2" in idx2.videos and "v0" not in idx2.videos


def test_video_evidence_attributed_in_multivideo_store(tmp_path):
    """Detailed-recall caption evidence carries "[video <id>]" when the store
    holds more than one video (per-video timelines restart at 0, so bare
    timestamps are ambiguous) and stays in the exact single-video reference
    format otherwise. Cross-video questions parse this attribution."""
    from hippomm_tpu.memory.schema import ThetaEvent
    from hippomm_tpu.retrieval.search import SearchHit

    def build(num_videos):
        cfg = Config()
        cfg.api.mode = "stub"
        cfg.models.imagebind_variant = "tiny"
        cfg.models.whisper_variant = "stub"
        cfg.storage.base_dir = str(tmp_path / f"store{num_videos}")
        mem = HippocampalMemory(config=cfg)
        mem.long_term_store = [
            ThetaEvent(video_id=f"vid{chr(65 + i)}", start_time=0.0, end_time=30.0)
            for i in range(num_videos)
        ]
        qa = QARecallSystem(mem, cfg)
        qa._frames_for_windows = (
            lambda vid, ws, fps=1.0, source_times=None: (
                source_times.extend([3.0]) if source_times is not None else None,
                ([b"jpg"], [3.0]),
            )[1]
        )
        qa._caption_frames = lambda jpegs: [f"a scene"] * len(jpegs)
        prompts = []

        class Recorder:
            def chat(self, messages, max_tokens=256, **kw):
                prompts.append(messages[-1]["content"])
                return "ANSWER: ok\nCONFIDENCE: 0.9"

        qa.reasoning = Recorder()
        return qa, prompts

    hits = [SearchHit("e0", "vidA", 3.0, 0.9, 0, (2.0, 4.0))]
    qa, prompts = build(2)
    qa._process_video_query("what is shown?", hits=hits)
    final = prompts[-1]
    assert "[video vidA] [3.0s] a scene" in final

    qa1, prompts1 = build(1)
    qa1._process_video_query("what is shown?", hits=hits)
    final1 = prompts1[-1]
    assert "[3.0s] a scene" in final1 and "[video" not in final1
