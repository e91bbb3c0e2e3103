import numpy as np
from scipy.ndimage import uniform_filter

from hippomm_tpu.ops.ssim import batched_ssim, frame_difference, rgb_to_gray


def ssim_oracle(x, y, data_range=255.0, win=7):
    """skimage.metrics.structural_similarity replica (uniform 7x7 window,
    sample covariance, interior crop)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    NP = win**2
    cov_norm = NP / (NP - 1)
    filt = lambda a: uniform_filter(a, size=win, mode="nearest")
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def test_ssim_matches_skimage_semantics(rng):
    a = rng.integers(0, 256, size=(3, 48, 64)).astype(np.uint8)
    noise = rng.integers(-20, 20, size=(3, 48, 64))
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    got = batched_ssim(a, b)
    want = np.array([ssim_oracle(a[i], b[i]) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ssim_identity(rng):
    a = rng.integers(0, 256, size=(1, 32, 32)).astype(np.uint8)
    assert abs(batched_ssim(a, a)[0] - 1.0) < 1e-5


def test_frame_difference(rng):
    a = rng.integers(0, 256, size=(2, 32, 32)).astype(np.uint8)
    d = np.asarray(frame_difference(a, a))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_rgb_to_gray(rng):
    f = rng.integers(0, 256, size=(2, 8, 8, 3)).astype(np.uint8)
    g = np.asarray(rgb_to_gray(f))
    want = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    np.testing.assert_allclose(g, want, rtol=1e-5)
