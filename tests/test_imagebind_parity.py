"""Hermetic parity tests: hippomm_tpu JAX ImageBind vs a torch mini-reference
with checkpoint-identical naming (BASELINE.md north star: embeddings match the
PyTorch reference to fp32 tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hippomm_tpu.models.imagebind.convert import convert_state_dict, infer_depths
from hippomm_tpu.models.imagebind.model import (
    audio_forward,
    text_forward,
    tiny_config,
    vision_forward,
)
from tests.torch_miniref import MiniImageBind

ATOL = 2e-4


@pytest.fixture(scope="module")
def miniref():
    torch.manual_seed(0)
    cfg = tiny_config()
    model = MiniImageBind(cfg).eval()
    params = convert_state_dict(model.checkpoint_state_dict(), cfg)
    return cfg, model, params


def test_infer_depths(miniref):
    cfg, model, _ = miniref
    depths = infer_depths(model.checkpoint_state_dict())
    assert depths == {"vision": 2, "audio": 2, "text": 2}


def test_vision_parity(miniref):
    cfg, model, params = miniref
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    want = model.forward_vision(torch.from_numpy(img)).numpy()
    got = np.asarray(vision_forward(params, jnp.asarray(img), cfg, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_audio_parity(miniref):
    cfg, model, params = miniref
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(2, 1, cfg.audio_mel_bins, cfg.audio_target_len)).astype(np.float32)
    want = model.forward_audio(torch.from_numpy(mel)).numpy()
    got = np.asarray(audio_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=ATOL * cfg.audio_logit_scale, rtol=1e-3)


def test_audio_multiclip(miniref):
    cfg, _, params = miniref
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(1, 3, 1, cfg.audio_mel_bins, cfg.audio_target_len)).astype(np.float32)
    got = np.asarray(audio_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32))
    assert got.shape == (1, cfg.embed_dim)


def test_text_parity(miniref):
    cfg, model, params = miniref
    rng = np.random.default_rng(4)
    tokens = np.zeros((2, cfg.context_length), dtype=np.int32)
    for i in range(2):
        n = 5 + i
        tokens[i, 0] = cfg.vocab_size - 2
        tokens[i, 1 : n + 1] = rng.integers(1, cfg.vocab_size - 2, size=n)
        tokens[i, n + 1] = cfg.vocab_size - 1  # EOS = max id
    want = model.forward_text(torch.from_numpy(tokens).long()).numpy()
    got = np.asarray(text_forward(params, jnp.asarray(tokens), cfg, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_bf16_close_to_fp32(miniref):
    """bf16 compute path stays within embedding-space tolerance (cosine > 0.999)."""
    cfg, _, params = miniref
    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    f32 = np.asarray(vision_forward(params, jnp.asarray(img), cfg, dtype=jnp.float32))
    bf16 = np.asarray(vision_forward(params, jnp.asarray(img), cfg, dtype=jnp.bfloat16))
    cos = (f32 * bf16).sum(-1)
    assert np.all(cos > 0.999), cos
