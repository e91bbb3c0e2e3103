import json, os, sys, tempfile, time, logging
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

import sys, os
sys.path.insert(0, "/root/repo")
from hippomm_tpu.config import Config
from hippomm_tpu.core.batch_process import process_video_folder
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.memory.engine import HippocampalMemory

work = tempfile.mkdtemp(prefix="prof_")
videos = os.path.join(work, "videos"); os.makedirs(videos)
warm = os.path.join(work, "warm"); os.makedirs(warm)
write_synthetic_video(os.path.join(warm, "warm.mp4"),
    SynthSpec(duration=30.0, fps=2.0, width=640, height=360,
              scene_changes=(14.0,), silence_regions=((13.0,15.0),), seed=1))
cuts = tuple(float(t) for t in range(25, 600, 25))
sil = tuple((float(t), float(t)+1.5) for t in range(40, 600, 60))
write_synthetic_video(os.path.join(videos, "vlog.mp4"),
    SynthSpec(duration=600.0, fps=2.0, width=640, height=360,
              scene_changes=cuts, silence_regions=sil, seed=2))

cfg = Config()
cfg.api.mode = "stub"
cfg.models.imagebind_variant = "huge"
cfg.models.imagebind_path = ""
cfg.models.whisper_variant = "distil-large-v3"
cfg.models.whisper_random_init = True
cfg.models.whisper_beam_size = 1
cfg.storage.base_dir = os.path.join(work, "store")
mem = HippocampalMemory(config=cfg)

from hippomm_tpu.ops.silence import detect_silence_regions
from hippomm_tpu.memory.segmentation import audio_window_levels
process_video_folder(warm, cfg.storage.base_dir, config=cfg, memory_system=mem, checkpoint_every=0)
z = np.zeros(int(600*16000), np.float32); detect_silence_regions(z); audio_window_levels(z)

mem.timers.reset() if hasattr(mem.timers, "reset") else None
# fresh timers: re-create summary baseline
import copy
before = {k: dict(v) for k, v in mem.timers.summary().items()}
t0 = time.perf_counter()
stats = process_video_folder(videos, cfg.storage.base_dir, config=cfg, memory_system=mem, checkpoint_every=0)
wall = time.perf_counter() - t0
after = mem.timers.summary()
delta = {}
for k, v in after.items():
    b = before.get(k, {"total_s": 0.0, "count": 0})
    delta[k] = {"total_s": round(v["total_s"] - b["total_s"], 3), "count": v["count"] - b["count"]}
print(json.dumps({"wall_s": round(wall,2), "realtime_x": round(stats["media_seconds"]/wall,2),
                  "stages": dict(sorted(delta.items(), key=lambda kv: -kv[1]["total_s"]))}, indent=1))
