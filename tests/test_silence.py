import numpy as np

from hippomm_tpu.ops.silence import (
    detect_silence_regions,
    silence_fraction,
    window_rms_db,
)


def make_signal(sr=16000):
    """2 s tone, 1 s silence, 2 s tone, 0.5 s silence."""
    t = lambda d: np.arange(int(sr * d)) / sr
    tone = lambda d: 0.5 * np.sin(2 * np.pi * 440 * t(d)).astype(np.float32)
    sil = lambda d: np.zeros(int(sr * d), dtype=np.float32)
    return np.concatenate([tone(2), sil(1), tone(2), sil(0.5)])


def test_window_rms_db_levels():
    sr = 16000
    x = make_signal(sr)
    db = np.asarray(window_rms_db(x, window=800, hop=800))
    # tone windows ~ 20*log10(0.5/sqrt(2)) ≈ -9 dB; silence at floor
    assert db[0] > -12
    assert db.min() <= -99


def test_detect_silence_regions():
    sr = 16000
    regions = detect_silence_regions(make_signal(sr), sr, threshold_db=-50, min_duration=0.1)
    assert len(regions) == 2
    (s1, e1), (s2, e2) = regions
    assert abs(s1 - 2.0) < 0.1 and abs(e1 - 3.0) < 0.1
    assert abs(s2 - 5.0) < 0.1 and abs(e2 - 5.5) < 0.1


def test_silence_fraction():
    sr = 16000
    frac = silence_fraction(make_signal(sr), sr, threshold_db=-50)
    assert abs(frac - 1.5 / 5.5) < 0.05
    assert silence_fraction(np.zeros(sr, dtype=np.float32), sr) > 0.95
