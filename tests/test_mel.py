import numpy as np
import pytest

from hippomm_tpu.ops.mel import KaldiFbank, WhisperMel
from hippomm_tpu.ops.melbank import mel_filterbank_kaldi, mel_filterbank_slaney


def kaldi_fbank_oracle(pcm, num_bins=128, sr=16000):
    """Slow numpy replica of torchaudio.compliance.kaldi.fbank (dither=0,
    hanning window, remove_dc_offset, preemphasis 0.97, snip_edges) on
    UNSCALED [-1, 1] float input — ImageBind's frontend convention (no
    16-bit rescale; see ops/mel.KaldiFbank.__call__)."""
    x = pcm.astype(np.float64)
    L, hop, padded = 400, 160, 512
    T = 1 + (len(x) - L) // hop
    mel = mel_filterbank_kaldi(num_bins, padded, sr).astype(np.float64)
    window = np.hanning(L)
    out = np.zeros((T, num_bins))
    for t in range(T):
        f = x[t * hop : t * hop + L].copy()
        f -= f.mean()  # remove_dc_offset
        f = np.concatenate([[f[0]], f])  # preemph uses x[-1]=x[0]
        f = f[1:] - 0.97 * f[:-1]
        f = f * window
        spec = np.fft.rfft(f, n=padded)
        power = np.abs(spec) ** 2
        e = np.finfo(np.float32).eps
        out[t] = np.log(np.maximum(mel @ power, e))
    return out


def test_kaldi_fbank_matches_oracle(rng):
    pcm = rng.normal(size=16000).astype(np.float32) * 0.1
    fb = KaldiFbank(num_mel_bins=128)
    got = np.asarray(fb(pcm))
    want = kaldi_fbank_oracle(pcm)
    assert got.shape == want.shape == (98, 128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_whisper_mel_matches_transformers(rng):
    try:
        from transformers import WhisperFeatureExtractor
    except Exception:
        pytest.skip("transformers WhisperFeatureExtractor unavailable")
    pcm = (rng.normal(size=16000 * 3) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=128)
    want = fe(
        pcm, sampling_rate=16000, padding="do_not_pad", do_normalize=False
    )["input_features"][0]
    mel = WhisperMel(n_mels=128)
    got = np.asarray(mel(pcm))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_slaney_melbank_properties():
    fb = mel_filterbank_slaney(80, 400, 16000)
    assert fb.shape == (80, 201)
    assert fb.min() >= 0
    # every interior filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_kaldi_melbank_properties():
    fb = mel_filterbank_kaldi(128, 512, 16000)
    assert fb.shape == (128, 257)
    assert fb[:, -1].max() == 0.0  # nyquist column zero
    assert fb.min() >= 0


def test_whisper_mel_shape(rng):
    pcm = (rng.normal(size=16000) * 0.1).astype(np.float32)
    got = np.asarray(WhisperMel(n_mels=80)(pcm))
    assert got.shape == (80, 100)
