"""Megatron TP+SP and GPipe pipeline parallelism (parallel/megatron.py).

Parity is against the single-program vision_forward on the same params —
the sharded paths must be numerically identical (fp32; psum_scatter changes
only summation order, observed error ~1e-7 at tiny dims).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippomm_tpu.models.imagebind.model import (
    ImageBindConfig,
    TowerConfig,
    init_imagebind,
    tiny_config,
    vision_forward,
)
from hippomm_tpu.parallel import megatron as M
from hippomm_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    ref = np.asarray(vision_forward(params, images, cfg, jnp.float32))
    return cfg, params, images, ref


def test_tp_sp_parity_mp4(tiny):
    cfg, params, images, ref = tiny
    mesh = make_mesh(model_parallel=4)  # dp=2 x tp/sp=4
    placed = M.place_tp_params(M.tp_block_layout(params["vision"]["blocks"]), mesh)
    out = np.asarray(
        M.vision_forward_tp_sp(params, placed, images, cfg, mesh, jnp.float32)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tp_sp_parity_mp2_remat(tiny):
    cfg, params, images, ref = tiny
    mesh = make_mesh(model_parallel=2)
    placed = M.place_tp_params(M.tp_block_layout(params["vision"]["blocks"]), mesh)
    out = np.asarray(
        M.vision_forward_tp_sp(params, placed, images, cfg, mesh, jnp.float32, remat=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pipeline_parity_2x2x2(tiny):
    cfg, params, images, ref = tiny
    mesh = make_mesh(model_parallel=2, pipeline_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    staged = M.add_stage_axis(M.tp_block_layout(params["vision"]["blocks"]), 2)
    placed = M.place_tp_params(staged, mesh, staged=True)
    for n_micro in (2, 4):
        out = np.asarray(
            M.vision_forward_pp(
                params, placed, images, cfg, mesh, n_micro=n_micro, dtype=jnp.float32
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pipeline_four_stages():
    """pipe=4 with a depth-4 tower: one block per stage, dp=1 x pp=4 x tp=2."""
    cfg = ImageBindConfig(
        vision=TowerConfig(width=64, depth=4, heads=4),
        audio=TowerConfig(width=48, depth=2, heads=4),
        text=TowerConfig(width=64, depth=2, heads=4),
        image_size=56,
        patch_size=14,
        vocab_size=512,
        context_length=16,
    )
    params = init_imagebind(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(6, 3, 56, 56)).astype(np.float32)
    ref = np.asarray(vision_forward(params, images, cfg, jnp.float32))
    mesh = make_mesh(model_parallel=2, pipeline_parallel=4)
    staged = M.add_stage_axis(M.tp_block_layout(params["vision"]["blocks"]), 4)
    placed = M.place_tp_params(staged, mesh, staged=True)
    out = np.asarray(
        M.vision_forward_pp(params, placed, images, cfg, mesh, n_micro=3, dtype=jnp.float32)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.isolated
def test_pp_train_step_matches_dp_tp_trajectory(tiny):
    """Three steps of the dp×pp×tp×sp contrastive train step reproduce the
    plain dp×tp step's loss trajectory on identical init/inputs.

    Marked `isolated` (fresh subprocess): this exact test has SIGABRTed the
    whole pytest process on a starved 1-core host (XLA CPU ppermute with 8
    virtual devices) while passing in a fresh process — VERDICT r2 #2."""
    from hippomm_tpu.train.contrastive import (
        init_train_state,
        init_train_state_pp,
        make_train_step,
        make_train_step_pp,
    )

    cfg, _, images, _ = tiny
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(8, cfg.context_length)).astype(
        np.int32
    )
    tokens[:, -1] = cfg.vocab_size - 1

    mesh = make_mesh(model_parallel=2, pipeline_parallel=2)
    sp, opt, tx, sh = init_train_state_pp(jax.random.PRNGKey(0), cfg, mesh, 1e-3)
    step = make_train_step_pp(cfg, mesh, tx, sh, n_micro=2, dtype=jnp.float32)
    pp_losses = []
    for _ in range(3):
        sp, opt, m = step(sp, opt, images, tokens)
        pp_losses.append(float(m["loss"]))
    assert all(np.isfinite(pp_losses))

    mesh2 = make_mesh(model_parallel=2)
    p2, o2, tx2, sh2 = init_train_state(jax.random.PRNGKey(0), cfg, mesh2, 1e-3)
    st2 = make_train_step(cfg, mesh2, tx2, sh2, dtype=jnp.float32)
    for i in range(3):
        p2, o2, m2 = st2(p2, o2, images, tokens)
        assert abs(pp_losses[i] - float(m2["loss"])) < 2e-3


def test_pipeline_grads_flow(tiny):
    """Grad flows through ppermute/all_gather/psum_scatter with a
    non-degenerate loss (pre-normalization embeddings vary with params)."""
    cfg, params, images, _ = tiny
    mesh = make_mesh(model_parallel=2, pipeline_parallel=2)
    staged = M.add_stage_axis(M.tp_block_layout(params["vision"]["blocks"]), 2)
    placed = M.place_tp_params(staged, mesh, staged=True)
    tgt = jnp.asarray(np.random.default_rng(2).normal(size=(8, cfg.embed_dim)), jnp.float32)

    def loss(blocks):
        e = M.vision_forward_pp(
            params, blocks, images, cfg, mesh, n_micro=2, dtype=jnp.float32
        )
        return jnp.sum(e * tgt)

    g = jax.grad(loss)(placed)
    total = float(sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(g)))
    assert np.isfinite(total) and total > 1e-3


def test_bias_kv_blocks_rejected(tiny):
    cfg, params, _, _ = tiny
    with pytest.raises(NotImplementedError):
        M.tp_block_layout(params["audio"]["blocks"])


def test_stage_axis_divisibility(tiny):
    _, params, _, _ = tiny
    packed = M.tp_block_layout(params["vision"]["blocks"])
    with pytest.raises(ValueError):
        M.add_stage_axis(packed, 3)  # depth 2 not divisible
