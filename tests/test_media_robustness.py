"""Native media runtime vs malformed containers: truncations, bit flips,
zero-length and garbage files must surface as Python exceptions or partial
results — never a crash of the process (the C++ shim runs in-process, so a
segfault here takes the whole pipeline down; reference behavior is
cv2/ffmpeg-subprocess isolation it gets for free)."""

import os

import numpy as np
import pytest

from hippomm_tpu.media.io import demux_audio, open_video
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video

SPEC = SynthSpec(
    duration=8.0,
    fps=4.0,
    width=160,
    height=120,
    scene_changes=(4.0,),
    silence_regions=(),
    seed=3,
)


@pytest.fixture(scope="module")
def good_mp4(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("robust") / "good.mp4")
    write_synthetic_video(p, SPEC)
    return p


def _try_full_read(path):
    """Open + read a few frames + demux audio; collect whatever raises."""
    try:
        r = open_video(path)
    except Exception:
        return "open_failed"
    try:
        n = min(getattr(r, "n_frames", 4) or 4, 4)
        idx = list(range(int(n)))
        r.read_gray_small(idx, 30, 40)
        r.read_rgb(idx[:1])
    except Exception:
        return "read_failed"
    finally:
        close = getattr(r, "close", None)
        if close:
            try:
                close()
            except Exception:
                pass
    try:
        demux_audio(path)
    except Exception:
        return "audio_failed"
    return "ok"


def test_zero_length_file(tmp_path):
    p = str(tmp_path / "empty.mp4")
    open(p, "wb").close()
    assert _try_full_read(p) in ("open_failed", "read_failed", "audio_failed")


def test_garbage_bytes(tmp_path):
    p = str(tmp_path / "garbage.mp4")
    with open(p, "wb") as f:
        f.write(os.urandom(4096))
    assert _try_full_read(p) in ("open_failed", "read_failed", "audio_failed")


@pytest.mark.parametrize("frac", [0.1, 0.5, 0.9, 0.99])
def test_truncated_mp4(good_mp4, tmp_path, frac):
    """mp4 moov commonly trails the mdat — any truncation point must fail
    cleanly or deliver a partial decode, never crash."""
    data = open(good_mp4, "rb").read()
    p = str(tmp_path / f"trunc_{int(frac*100)}.mp4")
    with open(p, "wb") as f:
        f.write(data[: int(len(data) * frac)])
    _try_full_read(p)  # any outcome but a crash is a pass


def test_bitflipped_mp4(good_mp4, tmp_path):
    """Flip bytes scattered through the body (headers intact): decoder may
    emit artifacts or errors, must not crash or hang."""
    data = bytearray(open(good_mp4, "rb").read())
    rng = np.random.default_rng(0)
    # leave the first 1 KiB (ftyp/moov head) so the demuxer engages
    for pos in rng.integers(1024, len(data), size=200):
        data[int(pos)] ^= 0xFF
    p = str(tmp_path / "flipped.mp4")
    with open(p, "wb") as f:
        f.write(bytes(data))
    _try_full_read(p)


def test_header_flipped_mp4(good_mp4, tmp_path):
    """Corrupt the container header region itself."""
    data = bytearray(open(good_mp4, "rb").read())
    rng = np.random.default_rng(1)
    for pos in rng.integers(4, min(2048, len(data)), size=64):
        data[int(pos)] ^= 0x55
    p = str(tmp_path / "headflip.mp4")
    with open(p, "wb") as f:
        f.write(bytes(data))
    _try_full_read(p)


def test_truncated_wav(tmp_path):
    from hippomm_tpu.media.io import load_audio_mono16k, write_wav

    p = str(tmp_path / "a.wav")
    write_wav(p, np.zeros(16000, np.float32), 16000)
    data = open(p, "rb").read()
    for frac in (0.3, 0.9):
        q = str(tmp_path / f"trunc_{int(frac*100)}.wav")
        with open(q, "wb") as f:
            f.write(data[: int(len(data) * frac)])
        try:
            out = load_audio_mono16k(q)
            assert out.ndim == 1  # partial read is acceptable
        except Exception:
            pass  # clean failure is acceptable
