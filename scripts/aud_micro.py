import sys, os, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video
p = os.path.join(tempfile.mkdtemp(), "v.mp4")
cuts = tuple(float(t) for t in range(25, 600, 25))
sil = tuple((float(t), float(t)+1.5) for t in range(40, 600, 60))
write_synthetic_video(p, SynthSpec(duration=600.0, fps=2.0, width=640, height=360,
                                   scene_changes=cuts, silence_regions=sil, seed=2))
from hippomm_tpu.media.io import demux_audio
t0=time.perf_counter(); pcm = demux_audio(p); t_demux=time.perf_counter()-t0
from hippomm_tpu.ops.silence import detect_silence_regions, silence_fraction
t0=time.perf_counter(); silence_fraction(pcm, 16000, -50.0); detect_silence_regions(pcm, 16000, -50.0); t_sil=time.perf_counter()-t0
t0=time.perf_counter(); detect_silence_regions(pcm, 16000, -50.0); t_sil2=time.perf_counter()-t0
from hippomm_tpu.memory.segmentation import audio_window_levels
t0=time.perf_counter(); audio_window_levels(pcm); t_rms=time.perf_counter()-t0
print(f"demux={t_demux:.2f} silence_first={t_sil:.2f} silence_again={t_sil2:.2f} rms_levels={t_rms:.2f}")
