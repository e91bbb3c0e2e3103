"""hippomm_tpu — a TPU-native multimodal memory framework.

From-scratch JAX/XLA/Pallas/pjit implementation of the capabilities of HippoMM
(reference: /root/reference — hippomm/core/hippocampal_memory.py et al.): temporal
pattern separation, perceptual encoding (ImageBind-style joint embeddings + Whisper
transcription), memory consolidation into ThetaEvents, and dual-pathway retrieval.

Layering (bottom up):
    media/      — C++/numpy media decode shim (WAV, Y4M, MJPEG-AVI, JPEG)
    ops/        — Pallas/XLA kernels: resize+normalize, SSIM, log-mel, RMS silence,
                  cosine top-k, key-frame dedup
    models/     — ImageBind towers, Whisper encoder/decoder (JAX), VLM/LLM HTTP clients
    memory/     — schemas, segmentation, consolidation, engine, persistence
    retrieval/  — QARecallSystem: fast semantic path + detailed recall
    parallel/   — device mesh, sharded feature stores, collectives
    train/      — contrastive (ImageBind-style) fine-tuning under pjit
    core/       — CLI surface (batch_process, ask_question) mirroring the reference
"""

__version__ = "0.1.0"

from hippomm_tpu.memory.schema import (  # noqa: F401
    QARecallResult,
    SequenceSegment,
    ShortTermMemory,
    ThetaEvent,
)


def load_config(path=None):
    from hippomm_tpu.config import load_config as _lc

    return _lc(path)
