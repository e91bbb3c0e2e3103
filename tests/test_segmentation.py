import numpy as np

from hippomm_tpu.media.synth import SynthSpec, generate
from hippomm_tpu.memory.segmentation import (
    adjacent_frame_similarity,
    audio_window_levels,
    find_boundaries,
    segment_sequence,
)


def test_adjacent_similarity_detects_cuts():
    spec = SynthSpec(duration=12.0, fps=5.0, width=160, height=120, scene_changes=(6.0,))
    res = generate(spec)
    ssim = adjacent_frame_similarity(res.frames)
    assert ssim.shape == (59,)
    cut_pair = 29  # frame 29 (t=5.8) -> frame 30 (t=6.0)
    assert ssim[cut_pair] < 0.9  # hard cut well below the 0.95 threshold
    within = np.delete(ssim, cut_pair)
    assert within.min() > 0.95  # intra-scene motion stays above it


def test_audio_window_levels():
    sr = 16000
    audio = np.concatenate(
        [0.5 * np.sin(np.arange(sr) / 5).astype(np.float32), np.zeros(sr, np.float32)]
    )
    db = audio_window_levels(audio, sr)
    assert db is not None
    assert db[0] > -20 and db[-1] <= -99


def test_find_boundaries_prefers_scene_cut():
    # 60 s @ 1 fps with a visual cut at t=25
    times = np.arange(60, dtype=float)
    ssim = np.ones(59, dtype=np.float32)
    ssim[24] = 0.3  # pair (24, 25) -> boundary time 25.0
    cuts = find_boundaries(times, ssim, None, 60.0, max_segment=30.0, min_segment=10.0)
    assert cuts[0] == 25.0


def test_find_boundaries_hard_cut_without_signal():
    times = np.arange(60, dtype=float)
    ssim = np.ones(59, dtype=np.float32)
    cuts = find_boundaries(times, ssim, None, 60.0, max_segment=30.0, min_segment=10.0)
    assert cuts[0] == 30.0


def test_find_boundaries_respects_min_segment():
    times = np.arange(60, dtype=float)
    ssim = np.ones(59, dtype=np.float32)
    ssim[3] = 0.1  # cut at t=4 is below min_segment=10 → ignored
    cuts = find_boundaries(times, ssim, None, 60.0, max_segment=30.0, min_segment=10.0)
    assert cuts[0] == 30.0


def test_segment_sequence_end_to_end():
    spec = SynthSpec(
        duration=40.0,
        fps=2.0,
        width=160,
        height=120,
        scene_changes=(18.0,),
        silence_regions=((17.5, 18.5),),
    )
    res = generate(spec)
    paths = [f"frame_{i}.jpg" for i in range(len(res.frames))]
    segs = segment_sequence(
        paths,
        res.frame_times,
        res.frames,
        res.audio,
        max_segment=30.0,
        min_segment=10.0,
        ssim_threshold=0.95,
        silence_db=-40.0,
    )
    assert len(segs) == 2
    assert abs(segs[0].end_time - 18.0) < 1.0  # cut found at the scene change
    assert segs[0].frames[0] == "frame_0.jpg"
    assert segs[-1].end_time == 40.0
    # audio sliced consistently
    total = sum(len(s.audio_data) for s in segs)
    assert abs(total - len(res.audio)) < 16000 // 2
    # frames partitioned, none lost
    assert sum(len(s.frames) for s in segs) == len(paths)


def test_adjacent_ssim_host_fallback_close_to_device(monkeypatch, rng):
    """A wedged adjacent-SSIM read falls back to the host numpy mirror with
    scores matching the device kernel (gray path is the exact mirror)."""
    import hippomm_tpu.memory.segmentation as seg

    grays = rng.integers(0, 256, size=(40, 90, 160)).astype(np.uint8)
    want = seg.adjacent_similarity_gray(grays)

    calls = {"n": 0}
    real_fetch = seg.fetch

    def wedged_fetch(x, dtype=None, give_up_s=None):
        calls["n"] += 1
        raise TimeoutError("synthetic wedge")

    monkeypatch.setattr(seg, "fetch", wedged_fetch)
    got = seg.adjacent_similarity_gray(grays)
    monkeypatch.setattr(seg, "fetch", real_fetch)
    assert calls["n"] == 1  # switched to host after the first wedge
    np.testing.assert_allclose(got, want, atol=1e-4)
