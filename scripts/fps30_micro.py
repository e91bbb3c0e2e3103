import sys, os, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
from hippomm_tpu.media.io import LibavReader
p = os.path.join(tempfile.mkdtemp(), "v.mp4")
write_synthetic_video(p, SynthSpec(duration=120.0, fps=30.0, width=640, height=360,
                                   scene_changes=(30.0,60.0,90.0), silence_regions=((55.0,57.0),), seed=3))
idx = list(range(0, 3600, 30))
for skip in (False, True):
    r = LibavReader(p)
    t0=time.perf_counter()
    blks=[]
    for b0 in range(0, len(idx), 64):
        blks.append(r.read_block(idx[b0:b0+64], 90, 160, skip_nonref=skip))
    t=time.perf_counter()-t0
    # sanity: compare gray vs exact decode for first block
    g = np.concatenate([b.gray for b in blks])
    for b in blks: b.close()
    r.close()
    if not skip: g_ref = g
    else:
        diff = np.abs(g.astype(int) - g_ref.astype(int)).mean()
        print(f"mean |gray diff| vs exact: {diff:.2f}")
    print(f"skip_nonref={skip}: {t:.2f}s for 120 candidates over 3600 frames")
