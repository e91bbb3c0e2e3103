"""HippocampalMemory — the memory engine (reference: hippocampal_memory.py:214-1612).

Same cognitive stages and public surface as the reference, re-planned for TPU:

  * temporal pattern separation: one batched device program scores all frame
    pairs + audio windows, host does the tiny greedy walk (segmentation.py)
  * perceptual encoding: ALL segments' frames go through ONE bucketized
    ImageBind vision forward; all segments' audio clips through ONE audio
    forward (the reference loops modality-by-modality per segment,
    :1172-1266, paying a CUDA round-trip each)
  * consolidation: on-device key-frame dedup scan (consolidation.py)
  * semantic replay: caption fan-out via thread-pooled HTTP (or stub), no
    mp.Pool pickling hazards (:2263)

Short-term buffer is keyed by video_id (the reference accidentally keys by
the first frame path, :538). Checkpoint/resume semantics preserved: per-video
STM checkpoints auto-resumed at the top of process_sequence (:1136-1150).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from hippomm_tpu.utils.device import fetch

from hippomm_tpu.config import Config
from hippomm_tpu.memory.consolidation import consolidate_short_term_memory
from hippomm_tpu.memory.schema import SequenceSegment, ShortTermMemory, ThetaEvent
from hippomm_tpu.memory.segmentation import segment_sequence
from hippomm_tpu.memory.store import MemoryStore
from hippomm_tpu.models.clients import make_client
from hippomm_tpu.models.foundation import ImageBind, QwenVL, Whisper
from hippomm_tpu.models.whisper.transcribe import Segment
from hippomm_tpu.utils.timers import StageTimer

logger = logging.getLogger(__name__)

CAPTION_PROMPT = "Describe this image in one concise sentence."


def process_frame_with_api(frame, index, model_name=None, config=None):
    """Caption one frame file via the configured endpoint; returns
    (index, "Frame {index+1}: <caption>") with the reference's error
    placeholders (reference: hippocampal_memory.py:152-211 — a module-level
    function precisely so mp.Pool can pickle it; here it is thread-safe and
    round-robins endpoints through the client layer instead)."""
    import os

    try:
        if not os.path.exists(frame):
            return index, f"[Error: Image file not found: {frame}]"
        with open(frame, "rb") as f:
            jpeg = f.read()
        if isinstance(config, Config):
            cfg = config
        else:
            from hippomm_tpu.config import _update_dataclass

            cfg = _update_dataclass(Config(), dict(config or {}))
        client = make_client(cfg.api.frame_processing, cfg.api.mode, purpose="frame-captioning")
        caption = client.caption_images([jpeg], CAPTION_PROMPT)[0]
        return index, f"Frame {index + 1}: {caption}"
    except Exception:
        logger.exception("Error processing image %s", frame)
        return index, f"[Error processing image {frame}]"


class HippocampalMemory:
    def __init__(
        self,
        config: Optional[Config] = None,
        imagebind_path: Optional[str] = None,
        whisper_model: Optional[str] = None,
        qwen_path: Optional[str] = None,
        models: Optional[Dict] = None,
    ):
        self.config = config or Config()
        m = self.config.models
        p = self.config.processing

        # engine parameters (reference defaults, hippocampal_memory.py:253-266)
        self.max_short_term = self.config.memory.max_short_term
        self.max_long_term = self.config.memory.max_long_term
        self.frame_buffer_size = p.frame_buffer_size
        self.max_segment_duration = p.max_segment_duration
        self.min_segment_duration = p.min_segment_duration
        self.frame_similarity_threshold = p.frame_similarity_threshold
        self.audio_silence_threshold = p.audio_silence_threshold
        self.keyframe_dedup_threshold = p.keyframe_dedup_threshold
        self.evict_stm_after_replay = self.config.memory.evict_after_replay

        # device mesh: data-parallel encode across all local chips by default
        # (config.system.mesh_data/mesh_model override; 1 chip → no mesh)
        self.mesh = None
        try:
            import jax

            from hippomm_tpu.parallel.mesh import make_mesh

            sys_cfg = self.config.system
            n_dev = len(jax.devices())
            reps = max(1, getattr(sys_cfg, "mesh_replicas", 1))
            denom = max(1, sys_cfg.mesh_model) * reps
            data = sys_cfg.mesh_data or (n_dev // denom)
            total = data * denom
            if data >= 1 and total > 1 and total <= n_dev:
                self.mesh = make_mesh(
                    total,
                    model_parallel=max(1, sys_cfg.mesh_model),
                    dcn_replicas=reps,
                )
            elif total > n_dev or data < 1:
                # data < 1: replicas x model alone exceed the device count, so
                # total computes to 0 and would otherwise be silently ignored
                logger.warning(
                    "configured mesh replicas=%d x data=%d x model=%d needs "
                    "%d devices but only %d are available — running "
                    "single-device",
                    reps, data, max(1, sys_cfg.mesh_model),
                    max(total, denom), n_dev,
                )
        except Exception:
            logger.exception("mesh setup failed; running single-device")

        # foundation models (injectable for tests)
        models = models or {}
        self.imagebind: ImageBind = models.get("imagebind") or ImageBind(
            model_path=imagebind_path or m.imagebind_path,
            variant=m.imagebind_variant,
            mesh=self.mesh,
        )
        self.whisper: Whisper = models.get("whisper") or Whisper(
            model_name=whisper_model or m.whisper_model,
            variant=m.whisper_variant,
            model_path=getattr(m, "whisper_path", "") or None,
            random_init=m.whisper_random_init,
            beam_size=m.whisper_beam_size,
            mesh=self.mesh,
        )
        self.qwen: QwenVL = models.get("qwen") or QwenVL(
            model_name=qwen_path or m.qwen_path, config=self.config
        )
        self.frame_client = models.get("frame_client") or make_client(
            self.config.api.frame_processing, self.config.api.mode, purpose="frame-captioning"
        )

        # memory state
        self.short_term_buffer: Dict[str, List[ShortTermMemory]] = {}
        self.long_term_store: List[ThetaEvent] = []
        self.consolidated: Dict[str, Dict] = {}
        self._frame_buffer: Dict[str, List] = {}  # video_id -> [(path, time)]
        self._full_audio: Dict[str, np.ndarray] = {}
        self._full_transcript: Dict[str, List] = {}  # video_id -> [Segment]
        self._transcript_full_track: set = set()  # _full_transcript covers whole video
        self._asr_futures: Dict[str, object] = {}  # video_id -> Future[[Segment]]
        # videos whose process_sequence buffered STMs but never finished its
        # checkpoint — the marker that distinguishes a FAILED attempt's
        # leftovers (safe to discard on retry) from STMs legitimately buffered
        # via add_memory / add_single_frame (which must be kept)
        self._inflight_ingests: set = set()

        self.store = MemoryStore(
            self.config.storage.base_dir,
            features_format=getattr(self.config.storage, "features_format", "json"),
        )
        self.timers = StageTimer()

    # ------------------------------------------------------------------ ingest

    def add_video(self, video_id: str, video_path: str = "") -> None:
        """Register a video (reference: hippocampal_memory.py:1277-1288)."""
        self.store.add_video(video_id, video_path)
        self.short_term_buffer.setdefault(video_id, [])

    def process_sequence(
        self,
        video_id: str,
        frame_paths: Optional[Sequence[str]] = None,
        frame_times: Optional[Sequence[float]] = None,
        frames_rgb: Optional[np.ndarray] = None,
        audio_data: Optional[np.ndarray] = None,
        sample_rate: int = 16000,
        video_duration: Optional[float] = None,
        auto_consolidate: bool = True,
        base_time: float = 0.0,
        frame_ssim: Optional[np.ndarray] = None,
        resume: bool = True,
        vision_stream=None,
    ) -> List[ShortTermMemory]:
        """Segment + perceptually encode a video's frames/audio into STMs
        (reference: hippocampal_memory.py:1116-1275).

        Accepts in-memory RGB frames (TPU path — no disk re-read) and/or frame
        paths (store-compat). Auto-resumes from a checkpoint if present.
        `base_time` offsets all produced timestamps — the reference's chunk
        offset for re-chunked long videos (hippocampal_memory.py:1134).
        `vision_stream` carries tower forwards ALREADY DISPATCHED during
        extraction (one per frames_rgb row, in order); when present the vision
        encode is a fetch instead of an upload+forward+fetch.
        """
        with self._maybe_trace():
            return self._process_sequence_impl(
                video_id, frame_paths, frame_times, frames_rgb, audio_data,
                sample_rate, video_duration, auto_consolidate, base_time,
                frame_ssim, resume, vision_stream,
            )

    def _maybe_trace(self):
        """jax.profiler trace around a whole ingest pass when
        system.profile_dir is set (default off — traces are large)."""
        d = getattr(self.config.system, "profile_dir", None)
        if d:
            import jax

            return jax.profiler.trace(d)
        import contextlib

        return contextlib.nullcontext()

    def _process_sequence_impl(
        self,
        video_id: str,
        frame_paths,
        frame_times,
        frames_rgb,
        audio_data,
        sample_rate: int,
        video_duration,
        auto_consolidate: bool,
        base_time: float,
        frame_ssim,
        resume: bool,
        vision_stream=None,
    ) -> List[ShortTermMemory]:
        # checkpoint fast-path (reference :1136-1150). Chunked long-video
        # ingest passes resume=False: chunk N+1 must not short-circuit on the
        # checkpoint chunk N just wrote.
        if resume and self.store.has_checkpoint(video_id):
            stms = self.store.load_checkpoint(video_id)
            if stms and video_duration:
                # a PARTIAL checkpoint (failed chunked-streaming attempt:
                # chunks 0..N-1 saved, chunk N died after frame metadata was
                # already written) must not fast-path into a silently
                # truncated event — resume only when the STMs actually cover
                # the video
                covered = max(
                    float(s.segment_info.get("end_time", 0.0) or 0.0) for s in stms
                )
                if covered < float(video_duration) - max(30.0, 0.1 * float(video_duration)):
                    logger.warning(
                        "%s: checkpoint covers %.0fs of %.0fs — partial "
                        "(failed streaming attempt); re-encoding instead of "
                        "resuming truncated", video_id, covered, video_duration,
                    )
                    stms = None
            if stms:
                logger.info("resumed %d STMs from checkpoint for %s", len(stms), video_id)
                self.short_term_buffer[video_id] = stms
                if audio_data is not None:
                    self._full_audio[video_id] = np.asarray(audio_data, np.float32)
                # a whole-track ASR dispatched for THIS ingest was normally
                # popped by _encode_segments, which this fast-path skips.
                # CONSUME it (the device pass is already in flight): replay's
                # holistic transcription then reuses the result instead of
                # re-transcribing the full track from scratch, and the future
                # stops pinning device token buffers
                fut = self._asr_futures.pop(video_id, None)
                if fut is not None:
                    with self.timers.stage("transcribe"):
                        self._full_transcript[video_id] = list(fut.result())
                    self._transcript_full_track.add(video_id)
                if auto_consolidate:
                    self.consolidate(video_id)
                    self.replay(video_id)
                return stms

        # A fresh whole-video ingest (base_time 0, resume semantics, no
        # checkpoint short-circuit above) must not extend() onto STMs left by
        # a FAILED earlier attempt — a successful attempt's STMs are evicted
        # by replay, so anything buffered by a still-inflight attempt is
        # stale and would duplicate every surviving segment in the final
        # ThetaEvent. Gated on the inflight marker: STMs buffered via the
        # incremental APIs (add_memory, add_single_frame) are NOT stale and
        # must be extended onto, exactly like the reference. The chunked
        # streaming path clears its own state (resume=False, caller purge in
        # process_single_video_streaming); this guards direct
        # process_sequence / process_single_video retries.
        if (
            resume
            and base_time == 0
            and video_id in self._inflight_ingests
            and self.short_term_buffer.get(video_id)
        ):
            logger.warning(
                "%s: discarding %d stale STMs from a previous failed attempt",
                video_id, len(self.short_term_buffer[video_id]),
            )
            self.short_term_buffer[video_id] = []

        frame_paths = list(frame_paths) if frame_paths is not None else []
        frame_times = list(frame_times) if frame_times is not None else []
        if frames_rgb is None and frame_paths:
            from hippomm_tpu.media.io import read_jpeg

            frames_rgb = np.stack([read_jpeg(fp) for fp in frame_paths])
        if audio_data is not None:
            audio_data = np.asarray(audio_data, dtype=np.float32)
            # keep the LONGEST known track: in chunked long-video flows the
            # full track was registered by dispatch_asr and must not be
            # clobbered by a 5-minute chunk (holistic transcription fallback
            # and detailed-recall re-slicing read this)
            prev = self._full_audio.get(video_id)
            if prev is None or len(audio_data) > len(prev):
                self._full_audio[video_id] = audio_data

        with self.timers.stage("segmentation"):
            segments = segment_sequence(
                frame_paths,
                frame_times,
                frames_rgb,
                audio_data,
                sample_rate=sample_rate,
                max_segment=self.max_segment_duration,
                min_segment=self.min_segment_duration,
                ssim_threshold=self.frame_similarity_threshold,
                silence_db=self.audio_silence_threshold,
                duration=video_duration,
                precomputed_ssim=frame_ssim,
            )
        logger.info("%s: %d segments", video_id, len(segments))

        if base_time:
            for seg in segments:
                seg.start_time += base_time
                seg.end_time += base_time
                seg.frame_times = [t + base_time for t in seg.frame_times]
            frame_times = [t + base_time for t in frame_times]

        stms = self._encode_segments(
            video_id, segments, frames_rgb, frame_times, sample_rate,
            base_time=base_time, call_audio=audio_data,
            vision_stream=vision_stream,
        )
        self._inflight_ingests.add(video_id)
        self.short_term_buffer.setdefault(video_id, []).extend(stms)

        with self.timers.stage("checkpoint"):
            self.store.save_checkpoint(video_id, self.short_term_buffer[video_id])
        # buffered state is now durably checkpointed: a crash from here on
        # resumes via the checkpoint fast-path, not a fresh re-encode
        self._inflight_ingests.discard(video_id)

        if auto_consolidate:
            self.consolidate(video_id)
            self.replay(video_id)
        return stms

    def _encode_segments(
        self,
        video_id: str,
        segments: List[SequenceSegment],
        frames_rgb: Optional[np.ndarray],
        frame_times: Sequence[float],
        sample_rate: int,
        base_time: float = 0.0,
        call_audio: Optional[np.ndarray] = None,
        vision_stream=None,
    ) -> List[ShortTermMemory]:
        """Perceptual encoding, batched across segments."""
        ft = np.asarray(list(frame_times), dtype=np.float64)

        # ---- vision: one forward over the concatenation of all segments ----
        seg_frame_idx: List[np.ndarray] = []
        for seg in segments:
            if len(ft):
                idx = np.nonzero((ft >= seg.start_time) & (ft < seg.end_time))[0]
            else:
                idx = np.zeros((0,), int)
            seg_frame_idx.append(idx)

        # ---- audio features: ONE fbank program + ONE tower forward over all
        # segments' clips (the reference runs a CUDA round-trip per segment,
        # :1172-1266; a per-clip loop here would be ~70 dispatches per video).
        # Dispatched BEFORE the vision fetch below: both towers queue on the
        # device together and the host pays one drain instead of two
        # (serialized vision-wait -> audio-dispatch -> audio-wait cost ~0.15 s
        # per short clip, measured on the clip30 micro).
        from hippomm_tpu.models.imagebind.preprocess import preprocess_audio_batch
        from hippomm_tpu.models.imagebind import model as ib_model
        import jax.numpy as jnp

        audio_embs: Dict[int, np.ndarray] = {}
        pcm_batch, mel_owner = [], []
        for si, seg in enumerate(segments):
            a = seg.audio_data
            if a is None or len(a) < sample_rate // 10:
                continue
            peak = float(np.max(np.abs(a))) or 1.0
            pcm_batch.append(a / peak)
            mel_owner.append(si)
        audio_handles = []
        if pcm_batch:
            with self.timers.stage("encode_audio"):
                # mels stay DEVICE-resident between fbank and the tower — a
                # fetch+re-upload between the two programs costs two tunnel
                # round trips for nothing
                mels = preprocess_audio_batch(
                    pcm_batch,
                    mel_bins=self.imagebind.cfg.audio_mel_bins,
                    target_len=self.imagebind.cfg.audio_target_len,
                )
                n_mels = mels.shape[0]
                # fixed 32-segment chunks: one compiled tower shape for any
                # segment count (hour-long videos have 100+). Dispatch ALL
                # chunks first (async), fetch after — the device pipelines
                # them back-to-back instead of idling at each host sync.
                for lo in range(0, n_mels, 32):
                    part = mels[lo : lo + 32]
                    n_real = part.shape[0]
                    if n_real < 32:
                        part = jnp.concatenate(
                            [part, jnp.repeat(part[-1:], 32 - n_real, axis=0)]
                        )
                    audio_handles.append(
                        (
                            n_real,
                            ib_model.audio_forward(
                                self.imagebind.params,
                                self.imagebind._shard_batch(part),
                                self.imagebind.cfg,
                                self.imagebind.dtype,
                            ),
                        )
                    )

        # ---- call_audio ASR: dispatch async NOW, collect in the
        # transcription section below. Ordering on the single device FIFO:
        # after the audio-tower dispatch (so encode_audio's fetch doesn't
        # queue behind the ASR programs) but before any fetch (so the ASR
        # runs while the host drains the towers and assembles STMs) — same
        # programs and results as the old synchronous transcribe at the
        # transcription stage, minus the dead device time. (The streamed
        # driver doesn't take this branch — its full-track up-front dispatch
        # measured FASTER at steady state, see
        # batch_process.process_single_video_streaming — but direct
        # engine-API ingests with audio_data get the overlap for free.)
        asr_chunk_finish = None
        if (video_id not in self._asr_futures
                and not (video_id in self._transcript_full_track and base_time)
                and call_audio is not None
                and len(call_audio) >= sample_rate // 10):
            asr_chunk_finish = self.whisper.transcribe_async(call_audio, sample_rate)

        vision_feats: Optional[np.ndarray] = None
        if (frames_rgb is None or not len(frames_rgb)) and vision_stream is not None:
            # no vision track to index into — release whatever the stream
            # dispatched instead of leaking its device handles (ADVICE r3 #3)
            if hasattr(vision_stream, "close"):
                vision_stream.close()
        if frames_rgb is not None and len(frames_rgb):
            all_idx = np.concatenate([i for i in seg_frame_idx]) if seg_frame_idx else []
            feats_all = None
            if vision_stream is not None:
                # tower forwards were dispatched during extraction — this is
                # (usually) just the fetch. One feature row per frames_rgb
                # row, in order; a mismatch (caller fed different frames)
                # falls back to a fresh encode rather than mis-indexing.
                with self.timers.stage("encode_vision"):
                    feats_all = vision_stream.result()
                if feats_all.shape[0] != len(frames_rgb):
                    logger.warning(
                        "%s: vision prefetch has %d rows for %d frames — "
                        "re-encoding", video_id, feats_all.shape[0], len(frames_rgb),
                    )
                    feats_all = None
            if feats_all is not None:
                vision_feats = feats_all[all_idx]
            else:
                with self.timers.stage("encode_vision"):
                    vision_feats = self.imagebind.encode_vision(frames_rgb[all_idx])

        if audio_handles:
            with self.timers.stage("encode_audio"):
                embs = np.concatenate(
                    [fetch(h, dtype=np.float32)[:n_real] for n_real, h in audio_handles]
                )
            for si, e in zip(mel_owner, embs):
                audio_embs[si] = e[None]

        # ---- transcription: ONE batched full-track ASR pass ----
        # The reference transcribes every segment slice AND the full track
        # again for the holistic transcription (:1238-1246, :1367-1415) —
        # double ASR compute. Here the track runs once (all 30 s windows in
        # bucketized chunk batches); per-segment texts are the timestamped ASR
        # segments assigned by midpoint, and replay reuses the same pass for
        # the holistic transcription. _full_transcript accumulates GLOBAL-time
        # segments, so chunked long-video ingest (base_time flow) transcribes
        # each chunk exactly once and the holistic text still covers the video.
        transcripts: Dict[int, List[Dict]] = {}
        asr_segs = None
        fut = self._asr_futures.pop(video_id, None)
        if fut is not None:  # full-track pass dispatched earlier (global times)
            with self.timers.stage("transcribe"):
                asr_segs = fut.result()
            self._full_transcript[video_id] = list(asr_segs)
            self._transcript_full_track.add(video_id)
        elif video_id in self._transcript_full_track and base_time:
            # chunked flow after a full-track dispatch: reuse, don't re-run
            asr_segs = self._full_transcript[video_id]
        elif call_audio is not None and len(call_audio) >= sample_rate // 10:
            with self.timers.stage("transcribe"):
                local = (
                    asr_chunk_finish()
                    if asr_chunk_finish is not None
                    else self.whisper.transcribe(call_audio, sample_rate)
                )
            asr_segs = [
                Segment(s.start + base_time, s.end + base_time, s.text) for s in local
            ] if base_time else local
            if base_time:
                # chunked flow: accumulate chunks in global time
                self._full_transcript.setdefault(video_id, []).extend(asr_segs)
            else:
                # fresh pass over the video's start (chunk 0 of a re-ingest,
                # or a plain single-call flow): RESET — extending would stack
                # a retried video's transcript on top of the failed attempt's
                self._full_transcript[video_id] = list(asr_segs)
                self._transcript_full_track.discard(video_id)
        if asr_segs is not None:
            for si, seg in enumerate(segments):
                lo, hi = seg.start_time, seg.end_time  # global, like asr_segs
                entries = [
                    {"text": s.text, "start": float(s.start), "end": float(s.end)}
                    for s in asr_segs
                    if s.text and lo <= (s.start + s.end) / 2 < hi
                ]
                if entries:
                    transcripts[si] = entries
        else:  # no track audio (add_memory path): per-segment batched ASR
            asr_owner = [
                si
                for si, seg in enumerate(segments)
                if seg.audio_data is not None and len(seg.audio_data) >= sample_rate // 10
            ]
            if asr_owner:
                with self.timers.stage("transcribe"):
                    seg_results = self.whisper.transcribe_batch(
                        [segments[si].audio_data for si in asr_owner], sample_rate
                    )
                for si, segs in zip(asr_owner, seg_results):
                    off = segments[si].start_time  # clip-local -> global times
                    transcripts[si] = [
                        {"text": s.text, "start": float(s.start + off), "end": float(s.end + off)}
                        for s in segs
                        if s.text
                    ]

        # ---- assemble STMs ----
        stms: List[ShortTermMemory] = []
        offset = 0
        for si, seg in enumerate(segments):
            idx = seg_frame_idx[si]
            feats: Dict[str, np.ndarray] = {}
            if vision_feats is not None and len(idx):
                feats["vision"] = vision_feats[offset : offset + len(idx)]
            offset += len(idx)
            if si in audio_embs:
                feats["audio"] = audio_embs[si]
            modalities = [m for m in ("vision", "audio") if m in feats]
            stms.append(
                ShortTermMemory(
                    features=feats,
                    content="",
                    timestamp=time.time(),
                    source_time=seg.start_time,
                    modalities=modalities,
                    segment_info={
                        "video_id": video_id,
                        "start_time": seg.start_time,
                        "end_time": seg.end_time,
                        "frames": list(seg.frames),
                        "frame_times": list(seg.frame_times),
                    },
                    transcription=transcripts.get(si, []),
                )
            )
        return stms

    def dispatch_asr(self, video_id: str, audio: np.ndarray, sample_rate: int = 16000):
        """Dispatch the full-track ASR device programs from THIS thread and
        stash the finisher; process_sequence picks it up exactly like a
        prefetch future. Unlike prefetch_asr (worker thread), this never
        contends for the single host core — dispatch is cheap, and the
        materializing sync happens later when the result is actually needed."""
        audio = np.asarray(audio, dtype=np.float32)
        if len(audio) < sample_rate // 10:
            return None
        self._full_audio[video_id] = audio
        finish = self.whisper.transcribe_async(audio, sample_rate)
        if finish is None:
            return None

        class _Finisher:
            def result(self):
                return finish()

        fut = _Finisher()
        self._asr_futures[video_id] = fut
        return fut

    def prefetch_asr(self, video_id: str, audio: np.ndarray, sample_rate: int = 16000):
        """Launch the full-track batched ASR on a background thread so the TPU
        transcribes WHILE the host decodes frames (they don't contend: ASR is
        device-bound, decode is host-bound). process_sequence picks the future
        up; harmless if never consumed."""
        import concurrent.futures

        audio = np.asarray(audio, dtype=np.float32)
        if len(audio) < sample_rate // 10:
            return None
        self._full_audio[video_id] = audio
        ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        fut = ex.submit(self.whisper.transcribe, audio, sample_rate)
        ex.shutdown(wait=False)
        self._asr_futures[video_id] = fut
        return fut

    def add_memory(
        self,
        video_id: str,
        video_frames: Optional[Sequence[str]] = None,
        audio_data: Optional[np.ndarray] = None,
        frame_times: Optional[Sequence[float]] = None,
        start_time: float = 0.0,
        end_time: float = 0.0,
    ) -> ShortTermMemory:
        """Encode one pre-segmented chunk directly (reference add_memory,
        hippocampal_memory.py:451-538 — which buggily keys the buffer by
        video_frames[0]; here the video_id is explicit)."""
        seg = SequenceSegment(
            start_time=start_time,
            end_time=end_time,
            frames=list(video_frames or []),
            audio_data=audio_data,
            frame_times=list(frame_times or list(np.arange(len(video_frames or [])))),
        )
        frames_rgb = None
        if video_frames:
            from hippomm_tpu.media.io import read_jpeg

            frames_rgb = np.stack([read_jpeg(p) for p in video_frames])
        stm = self._encode_segments(
            video_id, [seg], frames_rgb, seg.frame_times, 16000
        )[0]
        buf = self.short_term_buffer.setdefault(video_id, [])
        buf.append(stm)
        if len(buf) > self.max_short_term:
            self.consolidate(video_id)
        return stm

    # ------------------------------------------------------- frame micro-batch

    def add_single_frame(self, video_id: str, frame_path: str, frame_time: float) -> None:
        """Streaming ingest: buffer frames, encode in frame_buffer_size batches
        (reference: hippocampal_memory.py:1290-1365)."""
        buf = self._frame_buffer.setdefault(video_id, [])
        buf.append((frame_path, float(frame_time)))
        if len(buf) >= self.frame_buffer_size:
            self._process_frame_batch(video_id)

    def flush_frame_buffer(self, video_id: str) -> None:
        if self._frame_buffer.get(video_id):
            self._process_frame_batch(video_id)

    def _process_frame_batch(self, video_id: str) -> None:
        batch = self._frame_buffer.pop(video_id, [])
        if not batch:
            return
        paths = [p for p, _ in batch]
        times = [t for _, t in batch]
        feats = self.imagebind.encode_vision(paths)
        stm = ShortTermMemory(
            features={"vision": feats},
            timestamp=time.time(),
            source_time=times[0],
            modalities=["vision"],
            segment_info={
                "video_id": video_id,
                "start_time": times[0],
                "end_time": times[-1],
                "frames": paths,
                "frame_times": times,
            },
        )
        self.short_term_buffer.setdefault(video_id, []).append(stm)

    # ------------------------------------------------------------- consolidate

    def consolidate(self, video_id: Optional[str] = None) -> Optional[Dict]:
        """Merge a video's STMs into one consolidated record
        (reference: hippocampal_memory.py:540-586)."""
        if video_id is None:
            for vid in list(self.short_term_buffer):
                self.consolidate(vid)
            return None
        stms = self.short_term_buffer.get(video_id, [])
        with self.timers.stage("consolidate"):
            merged = consolidate_short_term_memory(
                stms, keyframe_threshold=self.keyframe_dedup_threshold
            )
        if merged is not None:
            merged["video_id"] = video_id
            self.consolidated[video_id] = merged
        return merged

    # ------------------------------------------------------------------ replay

    def replay(self, video_id: Optional[str] = None) -> Optional[ThetaEvent]:
        """Semantic replay: caption key frames, summarize, persist ThetaEvent
        (reference: hippocampal_memory.py:588-752)."""
        if video_id is None:
            if not self.consolidated:
                return None
            video_id = next(iter(self.consolidated))
        merged = self.consolidated.get(video_id)
        if merged is None:
            merged = self.consolidate(video_id)
            if merged is None:
                return None

        # caption every key frame (thread-pooled HTTP or stub) — one caption
        # per frames[] SLOT, placeholders included: filtering empty paths
        # here while the event stores the unfiltered frames/frame_times would
        # silently shift zip(frame_times, frame_captions) downstream
        captions: List[str] = []
        frame_paths = list(merged.get("frames", []))
        if any(frame_paths):
            jpegs = []
            for p in frame_paths:
                if not p:
                    jpegs.append(b"")  # placeholder slot (no stored path)
                    continue
                try:
                    with open(p, "rb") as f:
                        jpegs.append(f.read())
                except OSError:
                    jpegs.append(b"")
            with self.timers.stage("caption"):
                captions = self.frame_client.caption_images(jpegs, CAPTION_PROMPT)

        transcripts = merged.get("audio_transcription", [])
        with self.timers.stage("summary"):
            summary = self._summarize_event(captions, transcripts, merged["modalities"])

        event = ThetaEvent(
            video_id=video_id,
            features={k: v for k, v in merged["features"].items()},
            feature_times=merged["feature_times"],
            frames=merged.get("frames", []),
            frame_times=merged.get("frame_times", []),
            frame_captions=captions,
            audio_times=merged.get("audio_times", []),
            audio_transcription=transcripts,
            summary=summary,
            start_time=merged["start_time"],
            end_time=merged["end_time"],
            modalities=merged["modalities"],
        )
        # holistic transcription over the full audio track (reference :1367-1415);
        # reuses the single full-track ASR pass from perceptual encoding
        segs = self._full_transcript.get(video_id)
        if segs is None:
            full_audio = self._full_audio.get(video_id)
            if full_audio is not None and len(full_audio) > 1600:
                with self.timers.stage("holistic_transcribe"):
                    segs = self.whisper.transcribe(full_audio)
        if segs:
            event.holistic_audio_transcription = [
                {"text": s.text, "start": float(s.start), "end": float(s.end)}
                for s in segs
                if s.text
            ]

        self.store.save_theta_event(event)
        self.long_term_store.append(event)
        if len(self.long_term_store) > self.max_long_term:
            self.long_term_store = self.long_term_store[-self.max_long_term :]
        # consumed: a second replay() shouldn't duplicate the event (the
        # reference double-replays each video, SURVEY.md §3.1 note)
        self.consolidated.pop(video_id, None)
        # the video's STMs (~2-5 MB each) are now fully represented by the
        # persisted ThetaEvent + the per-video checkpoint on disk
        # (store.save_checkpoint); holding them in memory across a 1000-video
        # folder ingest would bloat RSS without bound
        if self.evict_stm_after_replay:
            self.short_term_buffer.pop(video_id, None)
        # the cached 16 kHz track is ~38 MB per 10-minute video; detailed
        # recall re-slices from the persisted audio.npy when this is gone
        # (retrieval/qa._audio_for_windows), so a large folder ingest must
        # not accumulate every video's waveform in host memory. BUT direct
        # engine-API ingests (process_sequence(audio_data=...) with no batch
        # extraction) never persisted audio.npy — evicting their only copy
        # would silently break post-replay audio re-transcription, so the
        # waveform stays resident exactly when no disk copy exists.
        if os.path.exists(os.path.join(self.store.audio_dir, video_id, "audio.npy")):
            self._full_audio.pop(video_id, None)
        # The full ASR segment list is consumed either way (it became the
        # event's holistic entries above) and must not accumulate.
        self._full_transcript.pop(video_id, None)
        self._transcript_full_track.discard(video_id)
        return event

    def discard_pending(self, video_id: str) -> None:
        """Drop everything a FAILED ingest attempt left behind: the pending
        ASR future + device token buffers (registered by dispatch_asr before
        process_sequence pops them), the cached waveform/transcript, partial
        STM/consolidated state, and the failed-attempt marker. The per-video
        error paths of every driver (folder batch, single-file, serving
        /ingest) call this — the registered-then-popped invariant lives HERE,
        next to the registration, not in each driver."""
        self._asr_futures.pop(video_id, None)
        self._full_audio.pop(video_id, None)
        self._full_transcript.pop(video_id, None)
        self._transcript_full_track.discard(video_id)
        self.short_term_buffer.pop(video_id, None)
        self.consolidated.pop(video_id, None)
        self._inflight_ingests.discard(video_id)

    def _summarize_event(
        self, captions: List[str], transcripts: List[str], modalities: List[str]
    ) -> str:
        parts = []
        if captions:
            shown = captions if len(captions) <= 1000 else captions[:: max(1, len(captions) // 1000)]
            parts.append("Frame captions:\n" + "\n".join(f"- {c}" for c in shown))
        if transcripts:
            texts = [t.get("text", "") if isinstance(t, dict) else str(t) for t in transcripts]
            parts.append("Audio transcription:\n" + " ".join(texts))
        if not parts:
            return ""
        prompt = (
            "Summarize the following video content in one sentence.\n\n" + "\n\n".join(parts)
        )
        try:
            return self.qwen.generate(prompt, max_tokens=128).strip()
        except Exception:
            logger.exception("summary generation failed")
            if captions:
                return captions[0]
            if transcripts:
                t0 = transcripts[0]
                return t0.get("text", "") if isinstance(t0, dict) else str(t0)
            return ""

    def update_holistic_audio_transcription(
        self, event: ThetaEvent, audio: Optional[np.ndarray] = None
    ) -> ThetaEvent:
        """Whole-track transcription onto an event (reference:
        hippocampal_memory.py:1367-1415 — ffmpeg full-video extract + Whisper;
        here the cached 16 kHz track or an explicit array)."""
        if audio is None:
            audio = self._full_audio.get(event.video_id)
        if audio is None or len(audio) <= 1600:
            return event
        segs = self.whisper.transcribe(np.asarray(audio, np.float32))
        event.holistic_audio_transcription = [
            {"text": s.text, "start": float(s.start), "end": float(s.end)}
            for s in segs
            if s.text
        ]
        return event

    # ------------------------------------------------------------- persistence

    def save_theta_event(self, event: ThetaEvent) -> str:
        return self.store.save_theta_event(event)

    def load_theta_event(self, event_id: str) -> ThetaEvent:
        event = self.store.load_theta_event(event_id)
        if all(e.event_id != event.event_id for e in self.long_term_store):
            self.long_term_store.append(event)
        return event

    def load_all_events(self) -> List[ThetaEvent]:
        self.long_term_store = self.store.load_all_events()
        return self.long_term_store

    def _save_checkpoint(self, video_id: str) -> str:
        return self.store.save_checkpoint(video_id, self.short_term_buffer.get(video_id, []))

    def _check_for_checkpoint(self, video_id: str) -> bool:
        return self.store.has_checkpoint(video_id)

    def _load_checkpoint(self, video_id: str) -> bool:
        stms = self.store.load_checkpoint(video_id)
        if stms is None:
            return False
        self.short_term_buffer[video_id] = stms
        return True

    def save_short_term_buffer(self, tag: str = "buffer") -> str:
        return self.store.save_short_term_buffer(self.short_term_buffer, tag)

    def load_short_term_buffer(self, tag: str = "buffer") -> None:
        loaded = self.store.load_short_term_buffer(tag)
        if loaded:
            self.short_term_buffer.update(loaded)

    # ------------------------------------------------------------------- misc

    def get_stats(self) -> Dict:
        """Buffer sizes + config snapshot (reference: hippocampal_memory.py:969-978)."""
        return {
            "short_term_videos": len(self.short_term_buffer),
            "short_term_memories": sum(len(v) for v in self.short_term_buffer.values()),
            "long_term_events": len(self.long_term_store),
            "max_short_term": self.max_short_term,
            "max_long_term": self.max_long_term,
            "frame_buffer_size": self.frame_buffer_size,
            "timers": self.timers.summary(),
        }
