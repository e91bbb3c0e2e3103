import numpy as np

from hippomm_tpu.ops.resize import CLIP_MEAN, CLIP_STD, resize_frames, resize_normalize


def test_resize_normalize_shape_and_stats(rng):
    frames = rng.integers(0, 256, size=(2, 360, 640, 3)).astype(np.uint8)
    out = np.asarray(resize_normalize(frames, size=224))
    assert out.shape == (2, 3, 224, 224)
    # gray-ish random noise should land near the normalized midpoint
    mid = (0.5 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(out.mean(axis=(0, 2, 3)), mid, atol=0.15)


def test_resize_normalize_matches_torch_bicubic(rng):
    import torch
    import torch.nn.functional as F

    frames = rng.integers(0, 256, size=(1, 448, 448, 3)).astype(np.uint8)
    got = np.asarray(resize_normalize(frames, size=224))

    x = torch.from_numpy(frames).permute(0, 3, 1, 2).float() / 255.0
    x = F.interpolate(x, size=(224, 224), mode="bicubic", antialias=True)
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    want = ((x - mean) / std).numpy()
    # resize kernels differ slightly at boundaries; interior must agree closely
    np.testing.assert_allclose(
        got[..., 4:-4, 4:-4], want[..., 4:-4, 4:-4], atol=0.05, rtol=0.05
    )


def test_resize_frames(rng):
    frames = rng.integers(0, 256, size=(3, 720, 1280, 3)).astype(np.uint8)
    out = np.asarray(resize_frames(frames, 180, 320))
    assert out.shape == (3, 180, 320, 3)
    assert out.dtype == np.uint8
