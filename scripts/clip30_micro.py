"""Profile the bench's single-30s-clip config (driver config #1 shape):
post-warm per-clip latency with a per-stage breakdown, over 3 fresh clips.

Usage: python scripts/clip30_micro.py [--cprofile]
"""
import json, os, sys, tempfile, time, logging
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

sys.path.insert(0, "/root/repo")
from hippomm_tpu.config import Config
from hippomm_tpu.core.batch_process import process_video_folder
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.memory.engine import HippocampalMemory

work = tempfile.mkdtemp(prefix="clip30_")
warm = os.path.join(work, "warm"); os.makedirs(warm)
write_synthetic_video(os.path.join(warm, "warm.mp4"),
    SynthSpec(duration=30.0, fps=2.0, width=640, height=360,
              scene_changes=(14.0,), silence_regions=((13.0, 15.0),), seed=1))

cfg = Config()
cfg.api.mode = "stub"
cfg.models.imagebind_variant = "huge"
cfg.models.imagebind_path = ""
cfg.models.whisper_variant = "distil-large-v3"
cfg.models.whisper_random_init = True
cfg.storage.base_dir = os.path.join(work, "store")
mem = HippocampalMemory(config=cfg)

from hippomm_tpu.utils.device import warm_transport
warm_transport()
process_video_folder(warm, cfg.storage.base_dir, config=cfg, memory_system=mem,
                     checkpoint_every=0)
# the warm pass's mask reads queued behind compiles — drop the poisoned
# router EMA exactly like bench.py does before its measured runs
from hippomm_tpu.ops.keyframe import reset_router
reset_router()
warm_transport()

use_cprofile = "--cprofile" in sys.argv
runs = []
for i in range(3):
    clip_dir = os.path.join(work, f"clip{i}"); os.makedirs(clip_dir)
    write_synthetic_video(os.path.join(clip_dir, f"clip{i}.mp4"),
        SynthSpec(duration=30.0, fps=2.0, width=640, height=360,
                  scene_changes=(14.0,), silence_regions=((13.0, 15.0),),
                  seed=5 + i))
    before = {k: dict(v) for k, v in mem.timers.summary().items()}
    prof = None
    if use_cprofile and i == 2:
        import cProfile
        prof = cProfile.Profile(); prof.enable()
    t0 = time.perf_counter()
    stats = process_video_folder(clip_dir, cfg.storage.base_dir, config=cfg,
                                 memory_system=mem, checkpoint_every=0)
    wall = time.perf_counter() - t0
    if prof is not None:
        prof.disable()
        import pstats
        pstats.Stats(prof, stream=sys.stderr).sort_stats("cumulative").print_stats(35)
    after = mem.timers.summary()
    delta = {}
    for k, v in after.items():
        b = before.get(k, {"total_s": 0.0, "count": 0})
        d = round(v["total_s"] - b["total_s"], 3)
        if d or v["count"] - b["count"]:
            delta[k] = {"s": d, "n": v["count"] - b["count"]}
    runs.append({"wall_s": round(wall, 3),
                 "realtime_x": round(stats["media_seconds"] / wall, 2),
                 "stages": dict(sorted(delta.items(), key=lambda kv: -kv[1]["s"]))})
print(json.dumps(runs, indent=1))
