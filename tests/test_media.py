import numpy as np
import pytest

from hippomm_tpu.media import io as mio
from hippomm_tpu.media.synth import SynthSpec, generate, write_synthetic_video


def test_native_shim_builds():
    assert mio.native_available(), "C++ media shim failed to build"


def test_jpeg_roundtrip(rng):
    # smooth gradient image (noise is pathological for JPEG)
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([yy * 3, xx * 2, (yy + xx)], axis=-1).astype(np.uint8)
    data = mio.jpeg_encode(img, quality=95)
    assert data[:2] == b"\xff\xd8"
    out = mio.jpeg_decode(data)
    assert out.shape == img.shape
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 4


def test_jpeg_file_roundtrip(tmp_path, rng):
    img = np.full((32, 32, 3), 128, dtype=np.uint8)
    img[:16] = [200, 50, 50]
    p = str(tmp_path / "f.jpg")
    mio.write_jpeg(p, img)
    out = mio.read_jpeg(p)
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 6


def test_jpeg_matches_pil(tmp_path, rng):
    """Native decode must agree with PIL's libjpeg decode."""
    import io as _io

    from PIL import Image

    img = rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8)
    data = mio.jpeg_encode(img, quality=90)
    pil = np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
    native = mio.jpeg_decode(data)
    assert np.max(np.abs(pil.astype(int) - native.astype(int))) <= 1


def test_wav_roundtrip(tmp_path, rng):
    pcm = (0.5 * np.sin(np.arange(16000) / 20)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    mio.write_wav(p, pcm, 16000)
    audio, rate = mio.read_wav(p)
    assert rate == 16000 and audio.shape == (16000, 1)
    np.testing.assert_allclose(audio[:, 0], pcm, atol=1e-4)
    mono = mio.load_audio_mono16k(p)
    np.testing.assert_allclose(mono, pcm, atol=1e-4)


def test_wav_resample(tmp_path):
    pcm = np.sin(np.arange(44100) * 2 * np.pi * 440 / 44100).astype(np.float32)
    p = str(tmp_path / "b.wav")
    mio.write_wav(p, np.stack([pcm, pcm], axis=1), 44100)
    mono = mio.load_audio_mono16k(p)
    assert abs(len(mono) - 16000) <= 2


def test_y4m_roundtrip(tmp_path, rng):
    frames = rng.integers(0, 256, size=(10, 48, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "v.y4m")
    mio.write_y4m(p, frames, fps=5.0)
    r = mio.open_video(p)
    assert r.info.num_frames == 10
    assert abs(r.info.fps - 5.0) < 1e-6
    out = r.read_rgb([0, 3, 9])
    assert out.shape == (3, 48, 64, 3)
    # YUV420 is chroma-lossy; luma must be close
    gray = lambda x: x.astype(float) @ [0.299, 0.587, 0.114]
    assert np.mean(np.abs(gray(out[0]) - gray(frames[0]))) < 3


def test_avi_roundtrip(tmp_path, rng):
    frames = np.zeros((8, 48, 64, 3), dtype=np.uint8)
    for i in range(8):
        frames[i] = (i * 30) % 255
    p = str(tmp_path / "v.avi")
    mio.write_avi(p, frames, fps=4.0)
    r = mio.open_video(p)
    assert r.info.num_frames == 8
    assert abs(r.info.fps - 4.0) < 0.1
    out = r.read_rgb(list(range(8)))
    assert np.mean(np.abs(out.astype(int) - frames.astype(int))) < 5
    r.close()


def test_sample_indices():
    info = mio.VideoInfo(64, 48, 30.0, 300, 10.0)
    idx = mio.sample_indices_at_fps(info, 1.0)
    assert len(idx) == 10
    assert idx[0] == 0 and idx[1] == 30


def test_synth_scene_changes(tmp_path):
    spec = SynthSpec(
        duration=6.0,
        fps=5.0,
        width=96,
        height=64,
        scene_changes=(2.0, 4.0),
        silence_regions=((1.0, 1.5),),
    )
    res = generate(spec)
    assert res.frames.shape == (30, 64, 96, 3)
    # hard cut between frame 9 (t=1.8) and 10 (t=2.0): large pixel delta
    d_cut = np.abs(res.frames[10].astype(int) - res.frames[9].astype(int)).mean()
    d_within = np.abs(res.frames[6].astype(int) - res.frames[5].astype(int)).mean()
    assert d_cut > 3 * d_within
    # silence region actually silent
    sr = spec.sample_rate
    assert np.max(np.abs(res.audio[int(1.1 * sr) : int(1.4 * sr)])) == 0.0


def test_write_synthetic_video(tmp_path):
    spec = SynthSpec(duration=2.0, fps=4.0, width=64, height=48)
    res = write_synthetic_video(
        str(tmp_path / "c.y4m"), spec, audio_path=str(tmp_path / "c.wav")
    )
    info = mio.probe_video(str(tmp_path / "c.y4m"))
    assert info.num_frames == len(res.frames)
    audio = mio.load_audio_mono16k(str(tmp_path / "c.wav"))
    assert len(audio) == len(res.audio)


def test_read_frames_at_times(tmp_path, rng):
    frames = rng.integers(0, 256, size=(20, 32, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "t.y4m")
    mio.write_y4m(p, frames, fps=10.0)
    out = mio.read_frames_at_times(p, [0.0, 0.5, 1.9, 99.0])
    assert out.shape == (4, 32, 32, 3)
