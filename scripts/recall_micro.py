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
from hippomm_tpu.retrieval.qa import QARecallSystem

work = tempfile.mkdtemp(); videos = os.path.join(work, "v"); os.makedirs(videos)
write_synthetic_video(os.path.join(videos, "clip.mp4"),
    SynthSpec(duration=120.0, fps=2.0, width=640, height=360,
              scene_changes=(30.0, 60.0, 90.0), silence_regions=((55.0,57.0),), seed=5))
cfg = Config(); cfg.api.mode="stub"
cfg.models.imagebind_variant="huge"; cfg.models.imagebind_path=""
cfg.models.whisper_variant="stub"
cfg.storage.base_dir=os.path.join(work,"store")
cfg.processing.fast_path_confidence = 2.0
mem = HippocampalMemory(config=cfg)
process_video_folder(videos, cfg.storage.base_dir, config=cfg, memory_system=mem, checkpoint_every=0)
qa = QARecallSystem(mem, cfg)
qa.answer_question("What is shown?")  # warm

import cProfile, pstats, io
t0=time.perf_counter()
r = qa.answer_question("What color is the moving square at the end?")
print(f"e2e: {(time.perf_counter()-t0)*1000:.0f}ms")
# instrument key internals
from hippomm_tpu.retrieval import qa as qam
orig_find = qa._find_relevant_video_segments
orig_frames = qa._frames_for_windows
def timed(name, fn):
    def w(*a, **k):
        t=time.perf_counter(); out=fn(*a,**k); print(f"  {name}: {(time.perf_counter()-t)*1000:.0f}ms"); return out
    return w
qa._find_relevant_video_segments = timed("find_segments", orig_find)
qa._frames_for_windows = timed("frames_for_windows", orig_frames)
qa._caption_frames = timed("caption", qa._caption_frames)
qa._classify_question_type = timed("classify", qa._classify_question_type)
qa._try_direct_answer = timed("direct", qa._try_direct_answer)
qa._final_answer = timed("final", qa._final_answer)
t0=time.perf_counter()
r = qa.answer_question("What color is the moving square at the end?")
print(f"e2e again: {(time.perf_counter()-t0)*1000:.0f}ms")
