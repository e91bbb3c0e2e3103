"""Benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.md driver metric): ingest throughput in video-hours
per hour per chip over a synthetic 10-minute vlog (driver config #3 shape),
through the REAL compute path: C++/numpy decode → device SSIM segmentation →
ImageBind ViT-H vision + audio towers (bf16, random weights — throughput is
weight-agnostic) → on-device key-frame dedup → stub VLM replay. Secondary
numbers (detailed-recall p50 over a 1k-event store, per-stage timings) ride
in the "extra" field. vs_baseline = value / 50 (the ≥50× real-time north
star; the reference publishes no numbers, BASELINE.json "published": {}).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from hippomm_tpu.config import Config
    from hippomm_tpu.core.batch_process import process_video_folder
    from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
    from hippomm_tpu.memory.engine import HippocampalMemory
    from hippomm_tpu.memory.schema import ThetaEvent
    from hippomm_tpu.retrieval.search import FeatureSearchIndex

    platform = jax.devices()[0].platform
    work = tempfile.mkdtemp(prefix="hippomm_bench_")
    videos = os.path.join(work, "videos")
    warm = os.path.join(work, "warm")
    os.makedirs(videos)
    os.makedirs(warm)

    # ---- workloads -------------------------------------------------------
    # warmup clip: 30 s (compiles every program shape once; persistent-cached)
    wspec = SynthSpec(duration=30.0, fps=2.0, width=640, height=360,
                      scene_changes=(14.0,), silence_regions=((13.0, 15.0),), seed=1)
    write_synthetic_video(os.path.join(warm, "warm.y4m"), wspec,
                          audio_path=os.path.join(warm, "warm.wav"))
    # measured clip: 10-minute vlog, scene change every ~25 s
    cuts = tuple(float(t) for t in range(25, 600, 25))
    sil = tuple((float(t), float(t) + 1.5) for t in range(40, 600, 60))
    mspec = SynthSpec(duration=600.0, fps=2.0, width=640, height=360,
                      scene_changes=cuts, silence_regions=sil, seed=2)
    write_synthetic_video(os.path.join(videos, "vlog.y4m"), mspec,
                          audio_path=os.path.join(videos, "vlog.wav"))

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "huge"
    cfg.models.imagebind_path = ""  # random weights: throughput-only
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = os.path.join(work, "store")

    mem = HippocampalMemory(config=cfg)

    # ---- warmup (compile) -------------------------------------------------
    process_video_folder(warm, cfg.storage.base_dir, config=cfg, memory_system=mem,
                         checkpoint_every=0)

    # ---- measured ingest ---------------------------------------------------
    t0 = time.perf_counter()
    stats = process_video_folder(videos, cfg.storage.base_dir, config=cfg,
                                 memory_system=mem, checkpoint_every=0)
    wall = time.perf_counter() - t0
    media_s = stats["media_seconds"] or 1e-9
    realtime = media_s / wall

    # ---- detailed-recall p50 over a 1k-event store -------------------------
    rng = np.random.default_rng(0)
    events = [
        ThetaEvent(
            video_id=f"v{i}",
            features={"vision": rng.normal(size=(20, 1024)).astype(np.float32)},
            feature_times={"vision": list(np.arange(20.0))},
            end_time=20.0,
        )
        for i in range(1000)
    ]
    index = FeatureSearchIndex.build(events, "vision")
    q = rng.normal(size=1024).astype(np.float32)
    index.search(q, top_k_per_event=5, global_top_k=5)  # warm
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        index.search(rng.normal(size=1024).astype(np.float32), top_k_per_event=5, global_top_k=5)
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lat, 50) * 1000)

    shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "ingest_throughput_10min_vlog",
        "value": round(realtime, 3),
        "unit": "video-hours/hour/chip (x realtime)",
        "vs_baseline": round(realtime / 50.0, 4),
        "extra": {
            "platform": platform,
            "ingest_wall_s": round(wall, 2),
            "media_s": media_s,
            "detailed_recall_p50_ms": round(p50_ms, 2),
            "recall_p50_target_ms": 200.0,
            "stage_timers": mem.timers.summary(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
