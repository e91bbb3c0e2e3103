import sys, os, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.media.io import LibavReader
from hippomm_tpu.ops.keyframe import KeyframeScanner
p = os.path.join(tempfile.mkdtemp(), "v.mp4")
cuts = tuple(float(t) for t in range(25, 600, 25))
sil = tuple((float(t), float(t)+1.5) for t in range(40, 600, 60))
write_synthetic_video(p, SynthSpec(duration=600.0, fps=2.0, width=640, height=360,
                                   scene_changes=cuts, silence_regions=sil, seed=2))
idx = list(range(0, 1200, 2)); times=[i/2.0 for i in idx]
r = LibavReader(p)
sc = KeyframeScanner(90, 160, 0.3, 1.0, block=256)
t_dec=t_feed=t_flush=0.0
pend=[]
for b0 in range(0, len(idx), 256):
    t0=time.perf_counter(); blk = r.read_block(idx[b0:b0+256], 90, 160); t_dec+=time.perf_counter()-t0
    t0=time.perf_counter(); h = sc.feed(blk.gray, times[b0:b0+256]); t_feed+=time.perf_counter()-t0
    pend.append((b0,h,blk))
t0=time.perf_counter()
for b0,h,blk in pend:
    m=np.asarray(h); js=np.nonzero(m)[0]
    if len(js): blk.take_rgb(js)
    blk.close()
t_flush=time.perf_counter()-t0
r.close()
print(f"decode={t_dec:.2f} feed={t_feed:.2f} flush={t_flush:.2f}")
