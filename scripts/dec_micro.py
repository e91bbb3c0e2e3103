import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.media.io import LibavReader
import tempfile
p = os.path.join(tempfile.mkdtemp(), "v.mp4")
cuts = tuple(float(t) for t in range(25, 600, 25))
sil = tuple((float(t), float(t)+1.5) for t in range(40, 600, 60))
write_synthetic_video(p, SynthSpec(duration=600.0, fps=2.0, width=640, height=360,
                                   scene_changes=cuts, silence_regions=sil, seed=2))
idx = list(range(0, 1200, 2))
# pure gray pass
r = LibavReader(p)
t0=time.perf_counter(); g = r.read_gray_small(idx, 90, 160); t_gray=time.perf_counter()-t0
r.close()
# block-hold pass without RGB takes
r = LibavReader(p)
t0=time.perf_counter()
blks=[]
for b0 in range(0, len(idx), 64):
    blks.append(r.read_block(idx[b0:b0+64], 90, 160))
t_hold=time.perf_counter()-t0
# take ~25% RGB
t0=time.perf_counter()
for blk in blks:
    blk.take_rgb(np.arange(0, len(blk.gray), 4))
t_rgb=time.perf_counter()-t0
for blk in blks: blk.close()
r.close()
print(f"gray_pass={t_gray:.2f}s hold_pass={t_hold:.2f}s take_rgb_25pct={t_rgb:.2f}s")
