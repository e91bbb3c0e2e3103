"""Hour-scale ingest proof (driver benchmark config #5 shape: hour-long
videos end-to-end through batch_process + ask_question).

Synthesizes an N-minute H.264 vlog (scene cuts + tone/silence audio), ingests
it through the FULL pipeline (libav decode → device keyframe scan → ImageBind
towers → Whisper ASR → consolidation → replay), then answers questions over
the store. Prints one JSON line with throughput + store shape.

Usage:
  python scripts/long_ingest.py [--minutes 60] [--fps 2] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--fps", type=float, default=2.0)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--tiny", action="store_true", help="tiny towers + stub ASR (smoke)")
    ap.add_argument("--keep", default=None, help="keep the store at this path")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from hippomm_tpu.config import Config
    from hippomm_tpu.core.batch_process import process_video_folder
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
    from hippomm_tpu.memory.engine import HippocampalMemory
    from hippomm_tpu.retrieval.qa import QARecallSystem

    dur = args.minutes * 60.0
    work = args.keep or tempfile.mkdtemp(prefix="hippomm_long_")
    videos = os.path.join(work, "videos")
    os.makedirs(videos, exist_ok=True)

    t0 = time.perf_counter()
    cuts = tuple(float(t) for t in range(25, int(dur), 25))
    sil = tuple((float(t), float(t) + 1.5) for t in range(40, int(dur), 60))
    write_synthetic_video(
        os.path.join(videos, "hourlong.mp4"),
        SynthSpec(duration=dur, fps=args.fps, width=args.width, height=args.height,
                  scene_changes=cuts, silence_regions=sil, seed=7),
    )
    synth_s = time.perf_counter() - t0

    cfg = Config()
    cfg.api.mode = "stub"
    if args.tiny:
        cfg.models.imagebind_variant = "tiny"
        cfg.models.whisper_variant = "stub"
    else:
        cfg.models.imagebind_variant = "huge"
        cfg.models.imagebind_path = ""
        cfg.models.whisper_variant = "distil-large-v3"
        cfg.models.whisper_random_init = True
        cfg.models.whisper_beam_size = 1
    cfg.storage.base_dir = os.path.join(work, "store")

    mem = HippocampalMemory(config=cfg)

    # warmup clip: exercises every program end-to-end ONCE before the measured
    # run. First executions on the tunneled TPU stall for seconds-to-minutes
    # per program (transport pathology) — interleaving them with the streaming
    # chunk pipeline wedges device reads mid-ingest; a serial warmup absorbs
    # them all up front (same shape as bench.py's warmup).
    from hippomm_tpu.utils.device import warm_transport

    warm_transport()  # absorb early-process read wedges on throwaway buffers
    warm_dir = os.path.join(work, "warm")
    os.makedirs(warm_dir, exist_ok=True)
    write_synthetic_video(
        os.path.join(warm_dir, "warm.mp4"),
        SynthSpec(duration=30.0, fps=args.fps, width=args.width, height=args.height,
                  scene_changes=(14.0,), silence_regions=((13.0, 15.0),), seed=1),
    )
    process_video_folder(warm_dir, cfg.storage.base_dir, config=cfg,
                         memory_system=mem, checkpoint_every=0)
    import numpy as _np

    mem.imagebind.encode_vision(_np.zeros((128, args.height, args.width, 3), _np.uint8))

    t0 = time.perf_counter()
    stats = process_video_folder(videos, cfg.storage.base_dir, config=cfg,
                                 memory_system=mem, checkpoint_every=0)
    wall = time.perf_counter() - t0
    assert stats["processed"] == 1, stats

    ev = mem.long_term_store[-1]
    qa = QARecallSystem(mem, cfg)
    qa.answer_question("warmup?")  # first-exec of the QA programs (text tower)
    t0 = time.perf_counter()
    answers = qa.answer_questions(
        ["What is the overall content?", "What color is the moving square?"]
    )
    qa_s = time.perf_counter() - t0

    out = {
        "media_minutes": args.minutes,
        "ingest_wall_s": round(wall, 1),
        "realtime_x": round(dur / wall, 2),
        "synth_s": round(synth_s, 1),
        "keyframes": len(ev.frames),
        "feature_rows": {k: list(map(int, v.shape)) for k, v in ev.features.items()},
        "transcript_chunks": len(ev.audio_transcription),
        "qa_s": round(qa_s, 2),
        "qa_answers_nonempty": all(bool(a.answer) for a in answers),
        "stage_timers": mem.timers.summary(),
    }
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
