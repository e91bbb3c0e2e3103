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

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.utils.device import fetch

from hippomm_tpu.ops.mel import WhisperMel
from hippomm_tpu.models.whisper.model import (
    WhisperConfig,
    beam_decode_batch,
    encoder_forward,
    greedy_decode,
)

logger = logging.getLogger(__name__)

CHUNK_SECONDS = 30.0
SAMPLE_RATE = 16000
TIME_PRECISION = 0.02  # seconds per timestamp token
_DECODE_WARNED = False  # one-shot tokenizer-failure warning


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
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.with_timestamps = with_timestamps
        self.beam_size = beam_size
        self.mesh = mesh
        if mesh is not None:
            from hippomm_tpu.parallel.mesh import replicated

            self.params = jax.device_put(params, replicated(mesh))
        self.mel = WhisperMel(n_mels=cfg.n_mels)
        self._chunk_samples = int(CHUNK_SECONDS * SAMPLE_RATE)
        self._beam_fns: Dict[int, object] = {}  # max_len -> jitted sharded beam

    def _shard_chunks(self, stacked: jnp.ndarray) -> jnp.ndarray:
        """Shard the chunk-batch axis over the mesh's batch split (data ×
        replica on multi-slice meshes — gate and placement must agree or
        device_put raises on the non-divisible split)."""
        if self.mesh is None:
            return stacked
        from hippomm_tpu.parallel.mesh import data_axis_size, data_sharding

        if stacked.shape[0] % data_axis_size(self.mesh):
            return stacked
        return jax.device_put(stacked, data_sharding(self.mesh, stacked.ndim))

    def _beam_decode(self, enc, prompt, max_len: int):
        """Beam decode, sharded over the mesh's data axis when possible.

        Beam state is strictly PER CHUNK — every gather in the decode loop
        (token/cache reordering) uses chunk-local row indices — so the chunk
        axis shards cleanly: shard_map runs the full while_loop per device on
        its local chunks with zero collectives inside the loop. (A jit over
        sharded inputs can't see that the gathers are local and would insert
        all-gathers of the (L, rows, H, T, hd) caches every step.)
        """
        from hippomm_tpu.parallel.mesh import data_axis_size

        if self.mesh is not None and enc.shape[0] % data_axis_size(self.mesh) == 0:
            fn = self._beam_fns.get(max_len)
            if fn is None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def local(p, e, pr):
                    return beam_decode_batch(
                        p, e, pr, self.cfg,
                        max_len=max_len, beam=self.beam_size, dtype=self.dtype,
                    )

                # batch axis splits over data — and replica too on a
                # multi-slice mesh (beam state is chunk-local, so any batch
                # split works with zero collectives inside the loop)
                lead = (
                    ("replica", "data")
                    if "replica" in self.mesh.axis_names
                    else "data"
                )
                fn = jax.jit(
                    shard_map(
                        local,
                        mesh=self.mesh,
                        in_specs=(P(), P(lead, None, None), P(lead, None)),
                        out_specs=(
                            P(lead, None, None), P(lead, None), P(lead, None)
                        ),
                        check_vma=False,
                    )
                )
                self._beam_fns[max_len] = fn
            return fn(self.params, enc, prompt)
        return beam_decode_batch(
            self.params, enc, prompt, self.cfg,
            max_len=max_len, beam=self.beam_size, dtype=self.dtype,
        )

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
            global _DECODE_WARNED
            if not _DECODE_WARNED:
                _DECODE_WARNED = True
                logger.exception(
                    "tokenizer decode failed — transcripts will be EMPTY "
                    "(mismatched vocab?); logged once"
                )
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
                    if cur:
                        # text decoded BEFORE the first timestamp (model
                        # skipped the opening marker, e.g. audio starting
                        # mid-utterance) — seed it at the chunk start instead
                        # of silently dropping it
                        segments.append(
                            Segment(offset, offset + t, self._decode_text(cur))
                        )
                        cur = []
                    cur_start = t
                else:
                    if cur:
                        segments.append(
                            Segment(offset + cur_start, offset + t, self._decode_text(cur))
                        )
                    cur_start, cur = t, []
            elif tid < ts0:
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
        return self.transcribe_many([pcm], sample_rate, max_new_tokens)[0]

    def transcribe_many(
        self,
        pcms: List[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        max_new_tokens: int = 224,
        max_chunk_batch: int = 32,
    ) -> List[List[Segment]]:
        """Batched long-form transcription: ALL 30 s windows of ALL inputs run
        as bucketized chunk batches — one batched mel, one encoder forward, one
        batched (beam or greedy) decode per bucket, instead of the reference's
        serial per-window CTranslate2 calls (foundation_models.py:181-215).

        The engine feeds every segment of a video through one call
        (memory/engine.py), so per-video ASR is a handful of device programs
        regardless of segment count.
        """
        return self.transcribe_many_async(pcms, sample_rate, max_new_tokens, max_chunk_batch)()

    def transcribe_many_async(
        self,
        pcms: List[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        max_new_tokens: int = 224,
        max_chunk_batch: int = 32,
    ):
        """Dispatch every ASR device program NOW (jax dispatch is async) and
        return a zero-arg finisher that materializes + parses the tokens.
        The caller can decode video frames on host while the chunk batches run
        on device — all from ONE thread (a prefetch thread was measured to
        fight the single-core host and to starve the extraction scan's device
        queue; dispatching eagerly and syncing late gets the overlap for free).
        """
        if sample_rate != SAMPLE_RATE:
            raise ValueError("resample to 16 kHz first (media.load_audio_mono16k)")
        if self.beam_size > 1:
            # beam multiplies the decode rows (batch x beam) and their KV/cross
            # caches; 32-wide chunks at beam-5 are 160 rows and measured SLOWER
            # than two 80-row loops (cache bandwidth dominates the step)
            max_chunk_batch = min(max_chunk_batch, 16)
        # ---- split every input into 30 s windows -----------------------------
        chunks: List[np.ndarray] = []
        owners: List[int] = []  # input index per chunk
        offsets: List[float] = []  # chunk start time within its input
        durs: List[float] = []  # actual (unpadded) seconds in the chunk
        for oi, pcm in enumerate(pcms):
            pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
            for start in range(0, max(1, len(pcm)), self._chunk_samples):
                chunk = pcm[start : start + self._chunk_samples]
                durs.append(len(chunk) / SAMPLE_RATE)
                if len(chunk) < self._chunk_samples:
                    chunk = np.pad(chunk, (0, self._chunk_samples - len(chunk)))
                chunks.append(chunk)
                owners.append(oi)
                offsets.append(start / SAMPLE_RATE)

        prompt1 = self._prompt()
        plen = prompt1.shape[1]
        max_len = min(plen + max_new_tokens, self.cfg.max_target_positions)
        n_frames_target = 2 * self.cfg.max_source_positions  # 3000 for 30 s

        handles = []  # (lo, n_real, tokens device array, lengths device array)
        for lo in range(0, len(chunks), max_chunk_batch):
            batch = chunks[lo : lo + max_chunk_batch]
            n = len(batch)
            # Bucketed compiled shapes (4 / 16 / max). Long tracks ride ONE
            # wide serialized decode while_loop (the loop's 224 steps cost
            # latency, not FLOPs, so fewer loops is less wall time per
            # video); but the common per-segment call is 1-16 chunks, and
            # padding a 1-chunk clip to 32 encoder/decode rows doubles its
            # FLOPs and KV-cache bandwidth for nothing on healthy hardware.
            b = next(t for t in (4, 16, max_chunk_batch) if n <= t or t == max_chunk_batch)
            b = min(b, max_chunk_batch)
            if b > n:
                batch = batch + [batch[-1]] * (b - n)
            stacked = self._shard_chunks(jnp.asarray(np.stack(batch)))
            mels = jax.vmap(self.mel)(stacked)[:, :, :n_frames_target]
            enc = encoder_forward(self.params, mels, self.cfg, self.dtype)
            prompt = jnp.asarray(np.repeat(prompt1, b, axis=0))
            if self.beam_size > 1:
                tokens, lengths, _ = self._beam_decode(enc, prompt, max_len)
                tokens, lengths = tokens[:, 0], lengths[:, 0]  # best hypothesis
            else:
                tokens, lengths = greedy_decode(
                    self.params, enc, prompt, self.cfg, max_len=max_len, dtype=self.dtype
                )
            handles.append((lo, n, tokens, lengths))

        def finish() -> List[List[Segment]]:
            results: List[List[Segment]] = [[] for _ in pcms]
            for lo, n, tokens_d, lengths_d in handles:
                tokens = fetch(tokens_d)
                lengths = fetch(lengths_d)
                for j in range(n):
                    ci = lo + j
                    ids = list(tokens[j][plen : int(lengths[j])])
                    chunk_segments = self._parse_segments(ids, offsets[ci])
                    for s in chunk_segments:  # clamp to real audio duration
                        s.end = min(s.end, offsets[ci] + durs[ci])
                        if s.end > s.start:
                            results[owners[ci]].append(s)
            return results

        return finish
