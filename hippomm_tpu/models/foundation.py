"""Foundation model wrappers — the reference-compatible model surface.

Mirrors hippomm/models/foundation_models.py's three classes (ImageBind :21-151,
Whisper :153-215, QwenVL :217-344) on top of the JAX towers:

  * ImageBind.extract_features  — batched, bucket-padded device forward; one
    jit per bucket size instead of per-call recompiles
  * Whisper.transcribe          — JAX Whisper, or a deterministic stub when no
    checkpoint is available (hermetic pipelines)
  * QwenVL.generate             — OpenAI-protocol HTTP client or stub; accepts
    both `prompt` strings and full message lists

Device placement is jax-native (pjit-ready); the reference's .cuda() calls
have no analog here.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.utils.device import fetch

from hippomm_tpu.config import Config
from hippomm_tpu.models.clients import ChatClient, make_client
from hippomm_tpu.models.imagebind import model as ib_model
from hippomm_tpu.models.imagebind.preprocess import load_tokenizer, preprocess_audio
from hippomm_tpu.models.whisper import model as wh_model
from hippomm_tpu.ops.resize import normalize_nchw, resize_crop_u8
from hippomm_tpu.models.whisper.transcribe import Segment, WhisperTranscriber

logger = logging.getLogger(__name__)

# Bounded compiled batch shapes per tower: encodes run as fixed 32-row chunks
# (vision adds a 128-wide bulk tier). Padding a 3-frame call to 32 wastes
# trivial compute (ViT-H batch-32 forward is ~160 ms); per-call shapes would
# mint a multi-second XLA compile mid-ingest — which dominates on
# remote/tunneled devices.
CHUNK = 32
BIG_CHUNK = 128  # bulk tier for the vision tower (see encode_vision)


class ImageBind:
    """Joint-embedding model wrapper (reference surface: extract_features).

    Pass `mesh` to run encodes DATA-PARALLEL across the mesh's "data" axis:
    params replicate, input batches shard on the leading axis, and XLA splits
    each tower forward across chips (ingest is embarrassingly parallel over
    frames/clips — SURVEY.md §2.4). Bucketed batch sizes are multiples of 32,
    so any data-axis size ≤32 that divides 32 works."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        variant: str = "huge",
        dtype=jnp.bfloat16,
        seed: int = 0,
        mesh=None,
    ):
        self.cfg = ib_model.get_config(variant)
        self.dtype = dtype
        self.mesh = mesh
        ckpt = None
        if model_path:
            for cand in (
                model_path,
                os.path.join(model_path, "imagebind_huge.pth"),
                os.path.join(model_path, "model.safetensors"),
            ):
                if os.path.isfile(cand):
                    ckpt = cand
                    break
        if ckpt:
            from hippomm_tpu.models.imagebind.convert import load_imagebind

            logger.info("loading ImageBind checkpoint: %s", ckpt)
            self.params = load_imagebind(ckpt, self.cfg)
        else:
            if variant == "huge":
                logger.warning(
                    "no ImageBind checkpoint at %s — random-init weights "
                    "(embeddings are structurally valid but not semantic)",
                    model_path,
                )
            self.params = ib_model.init_imagebind(jax.random.PRNGKey(seed), self.cfg)
        if mesh is not None:
            from hippomm_tpu.parallel.mesh import replicated

            self.params = jax.device_put(self.params, replicated(mesh))
        else:
            self.params = jax.device_put(self.params)
        # model_path may be the checkpoint FILE — the BPE vocab sits next to
        # it; joining onto the file path silently fell back to HashTokenizer
        tok_dir = model_path
        if tok_dir and os.path.isfile(tok_dir):
            tok_dir = os.path.dirname(tok_dir)
        self.tokenizer = load_tokenizer(
            tok_dir, vocab_size=self.cfg.vocab_size, context_length=self.cfg.context_length
        )
        # ONE fused program: uint8 224-crops -> normalize -> ViT forward.
        # The resize+crop runs on HOST (PIL, the reference's own transform
        # chain) so only (B, S, S, 3) uint8 crosses the link: raw 360x640
        # frames cost ~425 ms upload per 32-chunk on the tunneled transport
        # vs ~205 ms for the forward itself (scripts/vision_dispatch_micro).
        cfg, dtype = self.cfg, self.dtype
        self._vision_prog = jax.jit(
            lambda p, crops_u8: ib_model.vision_forward(
                p, normalize_nchw(crops_u8), cfg, dtype
            )
        )

    def _shard_batch(self, arr) -> jnp.ndarray:
        """Upload a bucket-padded host batch (sharded over the mesh "data"
        axis when one is attached); the jitted tower forward then runs
        data-parallel with zero code changes (XLA propagates the sharding;
        params are replicated). All tower uploads route through
        `timed_put` so transfer stalls land in the transport-health tally
        (VERDICT r3 Weak #3: device_put stalls were invisible to it)."""
        from hippomm_tpu.utils.device import timed_put

        sharding = None
        if self.mesh is not None:
            from hippomm_tpu.parallel.mesh import data_axis_size, data_sharding

            ndim = getattr(arr, "ndim", np.asarray(arr).ndim)
            if arr.shape[0] % data_axis_size(self.mesh) == 0:
                sharding = data_sharding(self.mesh, ndim)
        out, _ = timed_put(arr, sharding)
        return out

    # -- encoders ----------------------------------------------------------

    def encode_vision(self, frames: Union[np.ndarray, Sequence[str]]) -> np.ndarray:
        """uint8 (N, H, W, 3) frames or jpeg paths -> (N, 1024) fp32.
        Runs in fixed-size chunks (128-wide bulk tier + 32-wide remainder —
        exactly two compiled shapes for any N). Frames are resized+cropped on
        host (reference's PIL chain) so only S×S uint8 crops cross the link."""
        if len(frames) == 0:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        if isinstance(frames[0], str):
            from hippomm_tpu.media.io import read_jpeg

            frames = np.stack([read_jpeg(p) for p in frames])
        frames = resize_crop_u8(frames, self.cfg.image_size)
        n = frames.shape[0]
        handles = []  # dispatch ALL chunks async, fetch after: the device
        # pipelines chunk i+1 behind chunk i instead of idling per host sync
        lo = 0
        while lo < n:
            # two compiled shapes: 128-wide for bulk (higher MXU occupancy,
            # 4x fewer round trips on long videos), 32-wide for remainders
            # (padding a 10-frame tail to 128 would cost 4x its compute)
            size = BIG_CHUNK if n - lo >= BIG_CHUNK else CHUNK
            chunk = frames[lo : lo + size]
            m = len(chunk)
            lo += m
            if m < size:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], size - m, axis=0)])
            x = self._shard_batch(chunk)
            handles.append((m, self._vision_prog(self.params, x)))
        return np.concatenate([fetch(h[:m], dtype=np.float32) for m, h in handles])

    def vision_stream(self) -> "VisionEncodeStream":
        """Incremental encode_vision for producers that discover frames over
        time (the extractor's keyframe flushes): every full 32-frame chunk
        dispatches immediately, so the ViT forward runs on device WHILE the
        host is still decoding the rest of the video."""
        return VisionEncodeStream(self)

    def encode_audio(self, pcm: np.ndarray, clips_per_video: int = 3) -> np.ndarray:
        """16 kHz mono float32 -> (1, 1024) fp32 (clip-ensembled)."""
        mel = preprocess_audio(
            pcm,
            mel_bins=self.cfg.audio_mel_bins,
            target_len=self.cfg.audio_target_len,
            clips_per_video=clips_per_video,
        )
        out = ib_model.audio_forward(self.params, mel, self.cfg, self.dtype)
        return fetch(out, dtype=np.float32)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """list[str] -> (N, 1024) fp32."""
        if not texts:
            return np.zeros((0, self.cfg.embed_dim), np.float32)
        return fetch(self.encode_text_device(texts), dtype=np.float32)

    def encode_text_device(self, texts: Sequence[str]):
        """list[str] -> (N, 1024) DEVICE array — no host round trip. Retrieval
        feeds this straight into the fused top-k so a query costs ONE
        synchronizing read (the packed result) instead of two."""
        tokens = self._shard_batch(np.asarray(self.tokenizer(list(texts))))
        return ib_model.text_forward(self.params, tokens, self.cfg, self.dtype)

    # -- reference-compatible surface (foundation_models.py:135-151) --------

    def extract_features(self, inputs: Dict[str, object]) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if "vision" in inputs:
            out["vision"] = self.encode_vision(inputs["vision"])
        if "audio" in inputs:
            out["audio"] = self.encode_audio(np.asarray(inputs["audio"]))
        if "text" in inputs:
            out["text"] = self.encode_text(inputs["text"])
        return out


class VisionEncodeStream:
    """Incremental form of `ImageBind.encode_vision`.

    The whole-video ingest path used to be strictly serial: the host decodes
    + scores every candidate frame, and only THEN does the engine dispatch the
    vision tower over the kept keyframes — for a short clip that exposes the
    full tower latency (upload + forward + fetch) after an already host-bound
    extraction. Feeding kept frames here AS THEY ARE FLUSHED dispatches each
    full 32-frame chunk immediately, so the tower runs behind the decode and
    `result()` is usually a cheap fetch by the time the engine needs features
    (VERDICT r2 next-#6: short-clip fixed overhead).

    `result()` returns (N, 1024) fp32 in feed order. Per-frame outputs are
    identical to `encode_vision` over the concatenation when N < BIG_CHUNK
    (same 32-wide program; a ViT forward is row-independent, and pad rows are
    never returned). For larger N `encode_vision` prefers 128-wide bulk
    chunks — same math through a different XLA tiling, so values can differ
    by bf16 epsilon; callers needing bit-equality with a one-shot encode
    should not prefetch.

    The host resize+crop and the device dispatch run on ONE worker thread:
    PIL's resample and the extractor's C++ decode both release the GIL, so
    the ~2.8 ms/frame preprocess overlaps the decode AND the extractor's
    device-mask waits instead of adding to the decode loop's critical path
    (measured ~4 s/run of extract_vision_feed on the 2×10-min headline when
    it ran inline). One worker keeps feed order, so the output is unchanged.
    The same pattern already drives the full-track ASR future
    (engine.py: whisper.transcribe on a 1-thread executor).
    """

    def __init__(self, ib: ImageBind):
        self._ib = ib
        self._buf: List[np.ndarray] = []  # worker-thread only (until drain)
        self._buffered = 0  # worker-thread only (until drain)
        self._handles: List[tuple] = []  # (n_real, device handle); worker only
        self._val: Optional[np.ndarray] = None
        self._n_fed = 0
        self._pool = None
        self._jobs: List = []
        self._finalized = False

    def feed(self, frames_u8: np.ndarray) -> None:
        """Append uint8 (M, H, W, 3) frames; the worker thread resizes and
        dispatches every full 32-chunk."""
        if self._val is not None or self._finalized:
            raise RuntimeError(
                "VisionEncodeStream.feed() after result()/finalize()/close()"
            )
        if frames_u8 is None or len(frames_u8) == 0:
            return
        frames_u8 = np.asarray(frames_u8)
        self._n_fed += len(frames_u8)
        if self._pool is None:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._jobs.append(self._pool.submit(self._ingest, frames_u8))

    def _ingest(self, frames_u8: np.ndarray) -> None:
        # worker thread: resize+crop (reference PIL chain), chunk, dispatch
        if self._val is not None:
            return  # stream was close()d while this job sat in the queue
        self._buf.append(resize_crop_u8(frames_u8, self._ib.cfg.image_size))
        self._buffered += len(self._buf[-1])
        while self._buffered >= CHUNK:
            flat = np.concatenate(self._buf) if len(self._buf) > 1 else self._buf[0]
            self._dispatch(flat[:CHUNK])
            rest = flat[CHUNK:]
            self._buf = [rest] if len(rest) else []
            self._buffered = len(rest)

    def finalize(self) -> None:
        """Dispatch the (<32-frame) remainder NOW, without fetching.

        A 10-minute vlog keeps ~25 keyframes — fewer than one full chunk — so
        under folder ingest ALL of its vision compute used to dispatch inside
        `result()`, which the engine reaches only after the NEXT video's
        full-track ASR was already enqueued in the device FIFO; the vision
        fetch then waited behind seconds of another video's ASR (the clean
        r3 record's 4.7 s/run encode_vision tail). Extraction calls this the
        moment the last frame is fed, so the tower programs queue ahead.
        Idempotent; further feeds raise (extraction is complete)."""
        if self._val is not None or self._finalized:
            return
        self._finalized = True
        if self._pool is None:
            return  # nothing was ever fed

        def _drain():
            if self._val is not None:
                return  # close()d while queued
            if self._buffered:
                flat = np.concatenate(self._buf) if len(self._buf) > 1 else self._buf[0]
                self._dispatch(flat)
                self._buf, self._buffered = [], 0

        self._jobs.append(self._pool.submit(_drain))

    def _dispatch(self, chunk: np.ndarray) -> None:
        m = len(chunk)
        if m < CHUNK:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], CHUNK - m, axis=0)])
        x = self._ib._shard_batch(chunk)
        self._handles.append((m, self._ib._vision_prog(self._ib.params, x)))

    @property
    def frames_fed(self) -> int:
        return self._n_fed

    def close(self) -> None:
        """Abandon the stream WITHOUT joining the worker: close() runs on
        error paths (a failing video, a vision-less track) where the worker
        may be blocked inside a wedged `device_put` for minutes — waiting on
        it would hang the folder ingest at exactly the moment it is trying to
        skip a sick video (same rationale as KeyframeScanner.close's
        wait=False). `_val` is set first so the worker's remaining jobs see a
        closed stream; buffered frames and dispatched handles are dropped
        (an in-flight job may append one last handle — it is released when
        the stream object goes out of scope). Safe to call twice or after
        result(); feed() after close raises like feed-after-result does."""
        if self._val is None:
            self._val = np.zeros((0, self._ib.cfg.embed_dim), np.float32)
        self._jobs = []
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
        self._buf, self._buffered = [], 0
        self._handles = []

    def result(self) -> np.ndarray:
        """Drain the worker, dispatch the (<32) remainder, fetch, concatenate."""
        if self._val is None:
            for j in self._jobs:  # drain; re-raises a worker failure here
                j.result()
            self._jobs = []
            if self._pool is not None:
                self._pool.shutdown(wait=True)
                self._pool = None
            if self._buffered:
                flat = np.concatenate(self._buf) if len(self._buf) > 1 else self._buf[0]
                self._dispatch(flat)
                self._buf, self._buffered = [], 0
            fed = sum(m for m, _ in self._handles)
            assert fed == self._n_fed, (fed, self._n_fed)
            self._val = (
                np.concatenate([fetch(h[:m], dtype=np.float32) for m, h in self._handles])
                if self._handles
                else np.zeros((0, self._ib.cfg.embed_dim), np.float32)
            )
            self._handles = []
        return self._val


class StubWhisperSegments:
    """Deterministic transcription stub: emits per-5 s segments describing the
    audio's measured energy, so hermetic pipelines get stable non-empty text."""

    def transcribe(self, pcm: np.ndarray, sample_rate: int = 16000) -> List[Segment]:
        pcm = np.asarray(pcm, dtype=np.float32).reshape(-1)
        segs: List[Segment] = []
        step = 5 * sample_rate
        for i, start in enumerate(range(0, len(pcm), step)):
            chunk = pcm[start : start + step]
            rms = float(np.sqrt(np.mean(chunk**2))) if len(chunk) else 0.0
            if rms < 1e-4:
                text = ""
            else:
                text = f"Tone segment {i} with level {rms:.2f}."
            segs.append(
                Segment(start / sample_rate, min(len(pcm), start + step) / sample_rate, text)
            )
        return [s for s in segs if s.text]


class Whisper:
    """ASR wrapper (reference surface: transcribe with timestamps,
    foundation_models.py:181-215; feature extraction deliberately unsupported,
    same as the reference's NotImplemented __call__)."""

    def __init__(
        self,
        model_name: str = "distil-large-v3",
        model_path: Optional[str] = None,
        variant: Optional[str] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        random_init: bool = False,
        beam_size: int = 5,
        mesh=None,
    ):
        self.model_name = model_name
        variant = variant or model_name
        ckpt = None
        if model_path:
            for cand in (
                model_path,
                os.path.join(model_path, "pytorch_model.bin"),
                os.path.join(model_path, "model.safetensors"),
                os.path.join(model_path, "whisper.pth"),
            ):
                if os.path.isfile(cand):
                    ckpt = cand
                    break
            if ckpt is None:
                # an EXPLICIT checkpoint path that loads nothing must fail
                # loudly — silently stubbing filled stores with synthetic
                # transcripts while the user believed real weights were live
                raise FileNotFoundError(
                    f"models.whisper_path={model_path!r}: no checkpoint found "
                    "(looked for the path itself, pytorch_model.bin, "
                    "model.safetensors, whisper.pth)"
                )
        if variant == "stub":
            self.cfg = None
            self._impl = StubWhisperSegments()
        elif ckpt:
            from hippomm_tpu.models.whisper.convert import load_whisper

            self.cfg = wh_model.get_config(variant)
            params = load_whisper(ckpt, self.cfg)
            tokenizer = _try_whisper_tokenizer(model_path)
            self._impl = WhisperTranscriber(
                jax.device_put(params), self.cfg, tokenizer, dtype,
                beam_size=beam_size, mesh=mesh,
            )
        elif variant == "tiny" or random_init:
            # random weights: real compute path at full model scale (tiny for
            # hermetic tests, any variant for throughput benchmarking)
            self.cfg = wh_model.get_config(variant)
            params = wh_model.init_whisper(jax.random.PRNGKey(seed), self.cfg)
            self._impl = WhisperTranscriber(
                jax.device_put(params), self.cfg, None, dtype,
                beam_size=beam_size, mesh=mesh,
            )
        else:
            logger.warning("no Whisper checkpoint — using deterministic stub transcriber")
            self.cfg = None
            self._impl = StubWhisperSegments()

    def transcribe(self, audio: Union[str, np.ndarray], sample_rate: int = 16000) -> List[Segment]:
        if isinstance(audio, str):
            from hippomm_tpu.media.io import load_audio_mono16k

            audio = load_audio_mono16k(audio)
            sample_rate = 16000
        return self._impl.transcribe(np.asarray(audio, dtype=np.float32), sample_rate)

    def transcribe_batch(
        self, audios: Sequence[np.ndarray], sample_rate: int = 16000
    ) -> List[List[Segment]]:
        """Transcribe many clips in bucketized chunk batches — ONE encoder
        forward + ONE batched decode per bucket (the engine's per-segment ASR
        path; reference loops serially, hippocampal_memory.py:1238-1246)."""
        pcms = [np.asarray(a, dtype=np.float32) for a in audios]
        if hasattr(self._impl, "transcribe_many"):
            return self._impl.transcribe_many(pcms, sample_rate)
        return [self._impl.transcribe(p, sample_rate) for p in pcms]

    def transcribe_async(self, audio: np.ndarray, sample_rate: int = 16000):
        """Dispatch the full transcription to device NOW; returns a zero-arg
        finisher (None for the stub — nothing to overlap). The caller keeps the
        host busy (frame decode) while the ASR programs drain the device queue."""
        pcm = np.asarray(audio, dtype=np.float32)
        if hasattr(self._impl, "transcribe_many_async"):
            inner = self._impl.transcribe_many_async([pcm], sample_rate)
            return lambda: inner()[0]
        return None

    def __call__(self, *a, **k):
        raise NotImplementedError(
            "Whisper is transcription-only; use ImageBind for audio features"
        )


def _try_whisper_tokenizer(model_path: Optional[str]):
    if not model_path:
        return None
    try:
        from transformers import WhisperTokenizerFast

        return WhisperTokenizerFast.from_pretrained(model_path, local_files_only=True)
    except Exception:
        return None


class QwenVL:
    """VLM client wrapper (reference surface: generate, foundation_models.py:275-344).

    Unlike the reference — whose __init__ crashes when passed config
    (hippocampal_memory.py:250 vs foundation_models.py:220) and whose client
    hardcodes localhost:8000 — base urls come from config, and `mode:"stub"`
    runs without any endpoint."""

    def __init__(self, model_name: Optional[str] = None, config: Optional[Config] = None):
        cfg = config or Config()
        self.client: ChatClient = make_client(cfg.api.qwen, cfg.api.mode, purpose="qwen-vl")
        self.model_name = model_name or cfg.api.qwen.model_name

    def _expand_video_items(self, messages: List[Dict]) -> List[Dict]:
        """Expand {"type": "video"} content items into inline base64 frames
        (reference: foundation_models.py:290-332)."""
        import base64 as b64

        out = []
        for msg in messages:
            content = msg.get("content")
            if not isinstance(content, list):
                out.append(msg)
                continue
            new_content: List[Dict] = []
            for item in content:
                if isinstance(item, dict) and item.get("type") == "video":
                    src = item.get("video")
                    # max(1, ...): the old falsy-zero fallback turned the
                    # SPARSEST request (fps < 0.125 -> int() == 0) into the
                    # densest (8 frames)
                    max_frames = max(1, int(item.get("fps", 1.0) * 8))
                    if isinstance(src, list):  # already frame jpg paths —
                        # subsample to the SAME cap as the path form (a long
                        # event's full keyframe list would otherwise inline
                        # hundreds of base64 images into one request)
                        if len(src) > max_frames:
                            pick = np.linspace(0, len(src) - 1, max_frames).astype(int)
                            src = [src[i] for i in sorted(set(int(i) for i in pick))]
                        jpegs = []
                        for p in src:
                            try:
                                with open(p, "rb") as f:
                                    jpegs.append(f.read())
                            except OSError:
                                continue
                    else:
                        jpegs = self._load_video_frames(str(src), max_frames=max_frames)
                    for data in jpegs:
                        new_content.append(
                            {
                                "type": "image_url",
                                "image_url": {
                                    "url": "data:image/jpeg;base64,"
                                    + b64.b64encode(data).decode()
                                },
                            }
                        )
                else:
                    new_content.append(item)
            out.append({**msg, "content": new_content})
        return out

    def _load_video_frames(self, video_path: str, max_frames: int = 8) -> List[bytes]:
        """Uniformly sample frames from a video as JPEG bytes (reference:
        foundation_models.py:233-273 via decord; here the C++ media shim)."""
        from hippomm_tpu.media.io import jpeg_encode, open_video

        r = open_video(video_path)
        try:
            n = r.info.num_frames
            idx = sorted(set(np.linspace(0, n - 1, min(max_frames, n)).astype(int)))
            frames = r.read_rgb(idx)
        finally:
            r.close()
        return [jpeg_encode(f) for f in frames]

    def generate(
        self,
        prompt: Union[str, List[Dict]],
        images: Optional[Sequence[bytes]] = None,
        video_frames: Optional[np.ndarray] = None,
        max_tokens: int = 512,
        max_new_tokens: Optional[int] = None,
    ) -> str:
        """Text (+ optional jpeg images / raw frames) -> completion.
        Accepts the reference's generate(messages, max_new_tokens=...) calling
        convention (foundation_models.py:275-279), including message items of
        {"type": "video", "video": <path or frame-path list>, "fps": ...}
        which expand to inline base64 frames (:290-332)."""
        if max_new_tokens is not None:
            max_tokens = max_new_tokens
        if isinstance(prompt, list):
            return self.client.chat(self._expand_video_items(prompt), max_tokens=max_tokens)
        content: List[Dict] = [{"type": "text", "text": prompt}]
        jpegs: List[bytes] = list(images or [])
        if video_frames is not None:
            from hippomm_tpu.media.io import jpeg_encode

            jpegs += [jpeg_encode(f) for f in np.asarray(video_frames)]
        import base64 as b64

        for data in jpegs:
            content.append(
                {
                    "type": "image_url",
                    "image_url": {"url": "data:image/jpeg;base64," + b64.b64encode(data).decode()},
                }
            )
        return self.client.chat([{"role": "user", "content": content}], max_tokens=max_tokens)
