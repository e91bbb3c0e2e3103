"""Long-form transcription on top of the JAX Whisper core.

Mirrors the reference's Whisper.transcribe surface (foundation_models.py:181-215:
faster-whisper segments with start/end/text) — audio is chunked into 30 s
windows (the engine further chunks at 600 s, hippocampal_memory.py:1238-1246),
each window runs mel → encoder → KV-cached greedy decode as one device program,
and timestamp tokens give sub-chunk segment times when present.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from hippomm_tpu.ops.mel import WhisperMel
from hippomm_tpu.models.whisper.model import (
    WhisperConfig,
    encoder_forward,
    greedy_decode,
)

logger = logging.getLogger(__name__)

CHUNK_SECONDS = 30.0
SAMPLE_RATE = 16000
TIME_PRECISION = 0.02  # seconds per timestamp token


@dataclasses.dataclass
class Segment:
    start: float
    end: float
    text: str


class WhisperTranscriber:
    def __init__(
        self,
        params: Dict,
        cfg: WhisperConfig,
        tokenizer=None,
        dtype=jnp.bfloat16,
        with_timestamps: bool = True,
        beam_size: int = 5,  # reference default (foundation_models.py:181-215)
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.with_timestamps = with_timestamps
        self.beam_size = beam_size
        self.mel = WhisperMel(n_mels=cfg.n_mels)
        self._chunk_samples = int(CHUNK_SECONDS * SAMPLE_RATE)

    def _prompt(self) -> np.ndarray:
        c = self.cfg
        ids = [c.bos_token, c.lang_en_token, c.task_transcribe_token]
        if not self.with_timestamps:
            ids.append(c.no_timestamps_token)
        return np.asarray([ids], dtype=np.int32)

    def _decode_text(self, ids: List[int]) -> str:
        if self.tokenizer is None:
            return ""
        try:
            return self.tokenizer.decode(ids, skip_special_tokens=True).strip()
        except Exception:
            return ""

    def _parse_segments(self, ids: List[int], offset: float) -> List[Segment]:
        """Split on timestamp tokens (ids > no_timestamps_token)."""
        c = self.cfg
        ts0 = c.no_timestamps_token
        segments: List[Segment] = []
        cur_start: Optional[float] = None
        cur: List[int] = []
        for tid in ids:
            if tid == c.eot_token:
                break
            if tid > ts0:
                t = (tid - ts0 - 1) * TIME_PRECISION
                if cur_start is None:
                    cur_start = t
                else:
                    if cur:
                        segments.append(
                            Segment(offset + cur_start, offset + t, self._decode_text(cur))
                        )
                    cur_start, cur = t, []
            elif cur_start is not None or not self.with_timestamps:
                cur.append(tid)
        if cur and cur_start is not None:
            segments.append(
                Segment(offset + cur_start, offset + CHUNK_SECONDS, self._decode_text(cur))
            )
        if not segments:
            text_ids = [i for i in ids if i < ts0 and i != c.eot_token]
            segments = [Segment(offset, offset + CHUNK_SECONDS, self._decode_text(text_ids))]
        return segments

    def transcribe(
        self, pcm: np.ndarray, sample_rate: int = SAMPLE_RATE, max_new_tokens: int = 224
    ) -> List[Segment]:
        """16 kHz mono float32 -> list of timestamped segments."""
        pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
        if sample_rate != SAMPLE_RATE:
            raise ValueError("resample to 16 kHz first (media.load_audio_mono16k)")
        prompt = jnp.asarray(self._prompt())
        segments: List[Segment] = []
        n_frames_target = 2 * self.cfg.max_source_positions  # 3000 for 30 s
        for start in range(0, max(1, len(pcm)), self._chunk_samples):
            chunk = pcm[start : start + self._chunk_samples]
            actual_dur = len(chunk) / SAMPLE_RATE
            if len(chunk) < self._chunk_samples:
                chunk = np.pad(chunk, (0, self._chunk_samples - len(chunk)))
            mel = self.mel(jnp.asarray(chunk))  # (n_mels, 3000)
            mel = mel[:, :n_frames_target]
            enc = encoder_forward(self.params, mel[None], self.cfg, self.dtype)
            max_len = min(prompt.shape[1] + max_new_tokens, self.cfg.max_target_positions)
            if self.beam_size > 1:
                from hippomm_tpu.models.whisper.model import beam_decode

                tokens, lengths, _ = beam_decode(
                    self.params, enc, prompt, self.cfg,
                    max_len=max_len, beam=self.beam_size, dtype=self.dtype,
                )
            else:
                tokens, lengths = greedy_decode(
                    self.params, enc, prompt, self.cfg, max_len=max_len, dtype=self.dtype
                )
            ids = list(np.asarray(tokens[0][prompt.shape[1] : int(lengths[0])]))
            offset = start / SAMPLE_RATE
            chunk_segments = self._parse_segments(ids, offset)
            # clamp to real audio duration
            for s in chunk_segments:
                s.end = min(s.end, offset + actual_dur)
                if s.end > s.start:
                    segments.append(s)
        return segments
