import sys, os, time, tempfile, logging
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
import numpy as np
from hippomm_tpu.config import Config
from hippomm_tpu.core.batch_process import process_video_folder
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.memory.engine import HippocampalMemory

work = tempfile.mkdtemp(prefix="folder_")
videos = os.path.join(work, "videos"); os.makedirs(videos)
warm = os.path.join(work, "warm"); os.makedirs(warm)
write_synthetic_video(os.path.join(warm, "warm.mp4"),
    SynthSpec(duration=30.0, fps=2.0, width=640, height=360,
              scene_changes=(14.0,), silence_regions=((13.0,15.0),), seed=1))
for v in range(4):
    cuts = tuple(float(t) for t in range(25, 150, 25))
    write_synthetic_video(os.path.join(videos, f"v{v}.mp4"),
        SynthSpec(duration=150.0, fps=2.0, width=640, height=360,
                  scene_changes=cuts, silence_regions=((40.0,41.5),), seed=10+v))
cfg = Config(); cfg.api.mode = "stub"
cfg.models.imagebind_variant = "huge"; cfg.models.imagebind_path = ""
cfg.models.whisper_variant = "distil-large-v3"; cfg.models.whisper_random_init = True
cfg.models.whisper_beam_size = 1
cfg.storage.base_dir = os.path.join(work, "store")
mem = HippocampalMemory(config=cfg)
process_video_folder(warm, cfg.storage.base_dir, config=cfg, memory_system=mem, checkpoint_every=0)
from hippomm_tpu.memory.segmentation import audio_window_levels
from hippomm_tpu.ops.silence import detect_silence_regions
z = np.zeros(int(150*16000), np.float32); detect_silence_regions(z); audio_window_levels(z)
t0 = time.perf_counter()
import os as _os
stats = process_video_folder(videos, cfg.storage.base_dir, config=cfg, memory_system=mem, checkpoint_every=0, pipeline_lookahead=_os.environ.get("LOOKAHEAD","1")=="1")
wall = time.perf_counter() - t0
print(f"4x150s folder: wall={wall:.2f}s realtime={stats['media_seconds']/wall:.1f}x errors={stats['errors']}")
