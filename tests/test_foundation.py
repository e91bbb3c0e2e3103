"""Foundation wrapper surface tests (reference: foundation_models.py classes)."""

import numpy as np
import pytest

from hippomm_tpu.config import Config
from hippomm_tpu.models.foundation import ImageBind, QwenVL, StubWhisperSegments, Whisper


@pytest.fixture(scope="module")
def ib():
    return ImageBind(variant="tiny")


def test_extract_features_surface(ib, rng):
    frames = rng.integers(0, 256, size=(3, 64, 96, 3)).astype(np.uint8)
    pcm = (0.1 * np.sin(np.arange(32000) / 8)).astype(np.float32)
    out = ib.extract_features({"vision": frames, "audio": pcm, "text": ["a scene", "a sound"]})
    assert out["vision"].shape == (3, 1024)
    assert out["audio"].shape == (1, 1024)
    assert out["text"].shape == (2, 1024)
    # vision embeddings unit-norm; audio scaled by logit scale 20
    np.testing.assert_allclose(np.linalg.norm(out["vision"], axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(out["audio"], axis=1), 20.0, rtol=1e-3)


def test_encode_vision_bucketing_consistent(ib, rng):
    """Padding to a bucket must not change real rows."""
    frames = rng.integers(0, 256, size=(5, 64, 96, 3)).astype(np.uint8)
    full = ib.encode_vision(frames)
    one = ib.encode_vision(frames[:1])
    np.testing.assert_allclose(full[0], one[0], atol=1e-4, rtol=1e-3)


def test_encode_vision_big_chunk_tier(ib, rng):
    """N > 128 routes bulk through the 128-wide tier + 32-wide remainder;
    rows must match the small-chunk path."""
    frames = rng.integers(0, 256, size=(140, 32, 48, 3)).astype(np.uint8)
    out = ib.encode_vision(frames)
    assert out.shape == (140, 1024)
    probe = ib.encode_vision(frames[130:131])
    np.testing.assert_allclose(out[130], probe[0], atol=1e-4, rtol=1e-3)


def test_vision_stream_matches_encode_vision(ib, rng):
    """Incremental feeds (the extractor's flush pattern) must reproduce
    encode_vision over the concatenation — same 32-wide program, so rows are
    identical for N < 128."""
    frames = rng.integers(0, 256, size=(71, 64, 96, 3)).astype(np.uint8)
    s = ib.vision_stream()
    for lo, hi in ((0, 7), (7, 40), (40, 41), (41, 71)):  # uneven flush sizes
        s.feed(frames[lo:hi])
    assert s.frames_fed == 71
    out = s.result()
    np.testing.assert_array_equal(out, ib.encode_vision(frames))
    # result() is idempotent; feed-after-result is a caller bug
    assert s.result() is out
    with pytest.raises(RuntimeError):
        s.feed(frames[:1])


def test_vision_stream_empty(ib):
    s = ib.vision_stream()
    s.feed(np.zeros((0, 8, 8, 3), np.uint8))
    assert s.result().shape == (0, 1024)


def test_encode_text_deterministic(ib):
    a = ib.encode_text(["hello world"])
    b = ib.encode_text(["hello world"])
    np.testing.assert_array_equal(a, b)
    c = ib.encode_text(["different text entirely"])
    assert not np.allclose(a, c)


def test_whisper_stub_and_notimplemented():
    w = Whisper(variant="stub")
    pcm = np.concatenate(
        [0.3 * np.sin(np.arange(16000 * 6) / 10).astype(np.float32), np.zeros(16000)]
    )
    segs = w.transcribe(pcm)
    assert segs and all(s.text for s in segs)
    with pytest.raises(NotImplementedError):
        w()


def test_whisper_transcribe_from_wav(tmp_path):
    from hippomm_tpu.media.io import write_wav

    w = Whisper(variant="stub")
    pcm = 0.3 * np.sin(np.arange(16000 * 3) / 10).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, pcm)
    segs = w.transcribe(p)
    assert segs


def test_qwen_stub_generate(rng):
    cfg = Config()
    cfg.api.mode = "stub"
    q = QwenVL(config=cfg)
    text = q.generate("Summarize: a red square moves around.")
    assert text
    frames = rng.integers(0, 256, size=(2, 32, 32, 3)).astype(np.uint8)
    cap = q.generate("Describe these frames.", video_frames=frames)
    assert "frame signature" in cap or cap


def test_qwen_load_video_frames(tmp_path, rng):
    from hippomm_tpu.media.io import write_y4m

    frames = rng.integers(0, 256, size=(20, 48, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "v.y4m")
    write_y4m(p, frames, fps=10.0)
    cfg = Config()
    cfg.api.mode = "stub"
    q = QwenVL(config=cfg)
    jpegs = q._load_video_frames(p, max_frames=4)
    assert len(jpegs) == 4
    assert all(j[:2] == b"\xff\xd8" for j in jpegs)


def test_stub_whisper_silence_suppressed():
    s = StubWhisperSegments()
    segs = s.transcribe(np.zeros(16000 * 8, dtype=np.float32))
    assert segs == []


def test_qwenvl_video_message_expansion(tmp_path):
    """Reference message items {"type":"video", ...} expand to inline base64
    frames (foundation_models.py:290-332) — both path and frame-list forms."""
    import numpy as np

    from hippomm_tpu.config import Config
    from hippomm_tpu.media.io import write_jpeg, write_video_av
    from hippomm_tpu.models.foundation import QwenVL

    cfg = Config()
    cfg.api.mode = "stub"
    qwen = QwenVL(config=cfg)

    video = str(tmp_path / "v.mp4")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(20, 64, 64, 3)).astype(np.uint8)
    write_video_av(video, frames, fps=10.0)
    msgs = [
        {"role": "user", "content": [
            {"type": "text", "text": "describe"},
            {"type": "video", "video": video, "fps": 0.5},
        ]}
    ]
    expanded = qwen._expand_video_items(msgs)
    kinds = [i["type"] for i in expanded[0]["content"]]
    assert kinds[0] == "text" and "image_url" in kinds and "video" not in kinds
    assert qwen.generate(msgs)  # end-to-end through the stub client

    p = str(tmp_path / "f.jpg")
    write_jpeg(p, frames[0])
    msgs2 = [{"role": "user", "content": [{"type": "video", "video": [p, p]}]}]
    expanded2 = qwen._expand_video_items(msgs2)
    assert len(expanded2[0]["content"]) == 2
    assert all(i["type"] == "image_url" for i in expanded2[0]["content"])
