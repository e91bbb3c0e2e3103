"""Log-mel spectrogram frontends as fused device matmuls.

The per-frame preprocessing chain of both frontends (DC removal, preemphasis,
window) is LINEAR in the frame, so we fold it together with the real-DFT basis
into two precomputed (frame_len, n_bins) matrices. The whole frontend is then:

    frames (T, L)  @  A_cos, A_sin   →  power = re² + im²  →  @ melbank.T  →  log

— three MXU matmuls and elementwise ops, one jitted program. This replaces the
reference's CTranslate2/torchaudio C++ frontends (SURVEY.md §2.3).

Two instantiations:
  * WhisperMel  — hann(400, periodic), hop 160, reflect-pad center, n_fft 400,
    slaney mel (80 or 128 bins), log10 + dynamic-range compression. Matches
    openai-whisper / transformers.WhisperFeatureExtractor to fp32 tolerance.
  * KaldiFbank  — 25 ms / 10 ms snip-edges framing, per-frame DC removal,
    preemphasis 0.97, hann(symmetric) window, pad-to-512 DFT, HTK mel, ln.
    Matches torchaudio.compliance.kaldi.fbank (dither=0) — ImageBind's frontend.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Parity-critical frontend: force fp32 MXU inputs (TPU default is bf16).
_FP32 = jax.lax.Precision.HIGHEST

from hippomm_tpu.ops.melbank import mel_filterbank_kaldi, mel_filterbank_slaney


def _rdft_matrices(frame_len: int, n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: (frame_len, n_fft//2+1) cos and -sin matrices.

    A frame f (length frame_len, zero-padded to n_fft) has
    re[k] = Σ_n f[n] cos(2πkn/n_fft),  im[k] = -Σ_n f[n] sin(2πkn/n_fft).
    """
    n = np.arange(frame_len)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang), -np.sin(ang)


def _frame_signal(pcm: jax.Array, frame_len: int, hop: int, num_frames: int) -> jax.Array:
    """(N,) -> (num_frames, frame_len) via gather (static shapes)."""
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return pcm[idx]


class WhisperMel:
    """Whisper log-mel frontend. n_mels=128 for large-v3 family, 80 otherwise."""

    N_FFT = 400
    HOP = 160
    SAMPLE_RATE = 16000

    def __init__(self, n_mels: int = 128):
        self.n_mels = n_mels
        window = np.hanning(self.N_FFT + 1)[:-1]  # periodic hann
        cos, sin = _rdft_matrices(self.N_FFT, self.N_FFT)
        # numpy, NOT device arrays: these are captured as CONSTANTS in the
        # jitted __call__, and lowering a jaxpr with device-array constants
        # reads them back to host — a pathological (sometimes hanging) d2h on
        # the tunneled transport, paid at every fresh-process lowering even on
        # compile-cache hits. numpy constants lower without any device read.
        self.a_cos = (window[:, None] * cos).astype(np.float32)
        self.a_sin = (window[:, None] * sin).astype(np.float32)
        self.melbank = mel_filterbank_slaney(n_mels, self.N_FFT, self.SAMPLE_RATE).astype(
            np.float32
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def __call__(self, pcm: jax.Array) -> jax.Array:
        """pcm (N,) float32 in [-1,1] -> (n_mels, T) log-mel, T = N // HOP.

        Matches whisper.log_mel_spectrogram: reflect-pad N_FFT//2 both sides,
        stft, drop the last frame column, power, mel, log10-clamp, max-8 floor,
        (x+4)/4 scale.
        """
        x = pcm.astype(jnp.float32)
        pad = self.N_FFT // 2
        x = jnp.pad(x, (pad, pad), mode="reflect")
        t_total = 1 + (x.shape[0] - self.N_FFT) // self.HOP
        frames = _frame_signal(x, self.N_FFT, self.HOP, t_total)
        re = jnp.dot(frames, self.a_cos, preferred_element_type=jnp.float32, precision=_FP32)
        im = jnp.dot(frames, self.a_sin, preferred_element_type=jnp.float32, precision=_FP32)
        power = re * re + im * im  # (T, n_bins)
        power = power[:-1]  # whisper drops the final frame
        mel = jnp.dot(power, self.melbank.T, preferred_element_type=jnp.float32, precision=_FP32)
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
        log_spec = (log_spec + 4.0) / 4.0
        return log_spec.T  # (n_mels, T)


class KaldiFbank:
    """torchaudio.compliance.kaldi.fbank-compatible filterbank features."""

    SAMPLE_RATE = 16000
    FRAME_LEN = 400  # 25 ms
    HOP = 160  # 10 ms
    PADDED = 512  # next pow2
    PREEMPH = 0.97
    LOW_FREQ = 20.0

    def __init__(self, num_mel_bins: int = 128):
        self.num_mel_bins = num_mel_bins
        L = self.FRAME_LEN
        # Per-frame linear preprocessing, folded into the DFT basis:
        # D: remove DC (I - 1/L), P: preemphasis with x[-1] := x[0], W: window diag
        D = np.eye(L) - np.full((L, L), 1.0 / L)
        P = np.eye(L)
        P[1:, :L - 1] -= self.PREEMPH * np.eye(L - 1)
        P[0, 0] -= self.PREEMPH  # kaldi: first sample preemphasized against itself
        window = np.hanning(L)  # np.hanning is symmetric — kaldi "hanning"
        WPD = window[:, None] * (P @ D)
        cos, sin = _rdft_matrices(L, self.PADDED)
        # numpy, not device arrays — see WhisperMel.__init__ (device-array
        # jit constants trigger pathological d2h at every lowering)
        self.a_cos = (WPD.T @ cos).astype(np.float32)
        self.a_sin = (WPD.T @ sin).astype(np.float32)
        self.melbank = mel_filterbank_kaldi(
            num_mel_bins, self.PADDED, self.SAMPLE_RATE, self.LOW_FREQ
        ).astype(np.float32)

    def num_frames(self, n_samples: int) -> int:
        if n_samples < self.FRAME_LEN:
            return 0
        return 1 + (n_samples - self.FRAME_LEN) // self.HOP

    @functools.partial(jax.jit, static_argnames=("self",))
    def __call__(self, pcm: jax.Array) -> jax.Array:
        """pcm (N,) float32 in [-1, 1] -> (T, num_mel_bins) log-mel energies
        (natural log).

        NO 16-bit rescale: torchaudio.compliance.kaldi.fbank does NOT scale
        float input internally (matching the Kaldi BINARY requires the caller
        to multiply by 32768 — a widely-hit torchaudio gotcha), and
        ImageBind's frontend (imagebind/data.py waveform2melspec, AST-style)
        feeds unscaled [-1, 1] floats. The AST normalization constants this
        feeds (preprocess.py: mean −4.268, std 9.138) were measured on those
        UNSCALED fbanks — a ×32768 here would shift every log-mel by
        +2·ln(32768) ≈ +20.8 and push the audio tower ~1.1σ out of its input
        distribution under the real checkpoint.
        """
        x = pcm.astype(jnp.float32)
        t = self.num_frames(x.shape[0])
        frames = _frame_signal(x, self.FRAME_LEN, self.HOP, t)
        re = jnp.dot(frames, self.a_cos, preferred_element_type=jnp.float32, precision=_FP32)
        im = jnp.dot(frames, self.a_sin, preferred_element_type=jnp.float32, precision=_FP32)
        power = re * re + im * im
        mel = jnp.dot(power, self.melbank.T, preferred_element_type=jnp.float32, precision=_FP32)
        eps = float(np.finfo(np.float32).eps)
        return jnp.log(jnp.maximum(mel, eps))
