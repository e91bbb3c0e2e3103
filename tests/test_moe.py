"""Expert-parallel MoE (parallel/moe.py) on the virtual 8-device CPU mesh.

The oracle is per-token dense math: top-1 expert by router softmax, the
token's gate value scaling that single expert's FFN output — what the
dispatch/all_to_all/combine program must reproduce when capacity doesn't
bind. Grouping (which device routed a token) only matters through capacity,
so parity tests use a generous capacity_factor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippomm_tpu.models.layers import gelu
from hippomm_tpu.parallel.mesh import make_mesh
from hippomm_tpu.parallel.moe import (
    init_moe_params,
    moe_block,
    moe_reference,
    place_moe_params,
)

D, H, E = 32, 64, 8


def _params(seed=0):
    return init_moe_params(jax.random.PRNGKey(seed), D, H, E)


def _dense_oracle(p, x):
    """Per-token top-1 dense math (fp32)."""
    b, t, _ = x.shape
    xf = np.asarray(x, np.float32).reshape(-1, D)
    wr = np.asarray(p["router_w"])
    logits = xf @ wr
    gates = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    eidx = np.argmax(gates, axis=-1)
    out = np.zeros_like(xf)
    for i, e in enumerate(eidx):
        h = np.asarray(
            gelu(jnp.asarray(np.asarray(p["fc1_w"])[e] @ xf[i] + np.asarray(p["fc1_b"])[e]))
        )
        y = np.asarray(p["fc2_w"])[e] @ h + np.asarray(p["fc2_b"])[e]
        out[i] = gates[i, e] * y
    return out.reshape(b, t, D)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, model_parallel=4)


def test_moe_matches_dense_oracle(mesh):
    p = place_moe_params(_params(), mesh)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, D), jnp.float32)
    y, aux = moe_block(p, x, mesh, capacity_factor=8.0, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y), _dense_oracle(p, x), rtol=1e-4, atol=1e-4
    )
    assert np.isfinite(float(aux))


def test_moe_matches_single_group_reference(mesh):
    """The no-collectives oracle (moe_reference) at ONE token group equals the
    sharded program when capacity is generous (grouping only enters via
    capacity)."""
    p = _params(2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, D), jnp.float32)
    ys, _ = moe_block(place_moe_params(p, mesh), x, mesh,
                      capacity_factor=16.0, dtype=jnp.float32)
    yr, _ = moe_reference(p, x, capacity_factor=16.0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yr), rtol=1e-4, atol=1e-4)


def test_moe_capacity_drops_to_zero_rows(mesh):
    """Drop semantics: force every token onto expert 0 with capacity 1 —
    exactly ONE token per device group lands (the group's first token in
    local flatten order: b-major, t-minor); every other token's output row
    is exactly zero (so the residual form passes it through unchanged)."""
    p = _params(4)
    # zero router -> all-tie logits -> argmax returns 0 for every token
    p["router_w"] = jnp.zeros((D, E), jnp.float32)
    p = place_moe_params(p, mesh)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, D), jnp.float32)
    # mesh (dp=2, mp=4): groups cover b in {0..1, 2..3} x t in 4-token spans;
    # tokens_local = 8, capacity = ceil(cf * 8 / 8) = 1
    y, aux = moe_block(p, x, mesh, capacity_factor=0.125, dtype=jnp.float32)
    y = np.asarray(y)
    kept = {(b, t) for b in (0, 2) for t in (0, 4, 8, 12)}
    for b in range(4):
        for t in range(16):
            if (b, t) in kept:
                assert np.any(y[b, t] != 0.0), (b, t)
            else:
                assert np.all(y[b, t] == 0.0), (b, t)
    assert np.isfinite(float(aux))


def test_moe_aux_near_one_when_balanced(mesh):
    """Random init routes ~uniformly; Switch aux = E * Σ f_e p_e ≈ 1."""
    p = place_moe_params(_params(6), mesh)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 32, D), jnp.float32)
    _, aux = moe_block(p, x, mesh, capacity_factor=2.0, dtype=jnp.float32)
    assert 0.5 < float(aux) < 2.0


def test_moe_differentiable_and_trains(mesh):
    """grad flows through dispatch/all_to_all/combine AND the router gate;
    a few SGD steps reduce a toy regression loss."""
    p = _params(8)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 16, D), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(10), (4, 16, D), jnp.float32)

    def loss_fn(params):
        y, aux = moe_block(params, x, mesh, capacity_factor=2.0, dtype=jnp.float32)
        return jnp.mean((y - tgt) ** 2) + 0.01 * aux

    p = place_moe_params(p, mesh)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(5):
        loss, g = grad_fn(p)
        losses.append(float(loss))
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
        p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
    # the router receives gradient through the gate value
    assert losses[-1] < losses[0]


def test_moe_validates_divisibility(mesh):
    p = place_moe_params(_params(), mesh)
    bad_tokens = jax.random.normal(jax.random.PRNGKey(0), (4, 15, D), jnp.float32)
    with pytest.raises(ValueError):
        moe_block(p, bad_tokens, mesh)
    p5 = init_moe_params(jax.random.PRNGKey(0), D, H, 5)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, D), jnp.float32)
    with pytest.raises(ValueError):
        moe_block(place_moe_params(_params(), mesh) | {"router_w": p5["router_w"]}, x, mesh)


@pytest.mark.isolated
def test_moe_adapter_trains_on_frozen_towers(mesh):
    """dp x ep adapter fine-tuning: frozen tiny towers, residual MoE over the
    embeddings, a few steps reduce the InfoNCE+balance loss; tower params
    receive no gradient by construction (stop_gradient).

    Marked `isolated`: 6 jitted steps of all_to_all over 8 virtual CPU
    devices — the collective-heavy class that has aborted a long-lived suite
    process on a 1-core host (see conftest)."""
    from hippomm_tpu.models.imagebind.model import init_imagebind, tiny_config
    from hippomm_tpu.train.contrastive import (
        init_moe_adapter_state,
        make_train_step_moe,
    )

    cfg = tiny_config()
    frozen = init_imagebind(jax.random.PRNGKey(0), cfg)
    moe, opt, tx = init_moe_adapter_state(
        jax.random.PRNGKey(1), cfg, mesh, n_experts=8, learning_rate=3e-3
    )
    step = make_train_step_moe(frozen, cfg, mesh, tx, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b = mesh.shape["data"] * mesh.shape["model"] * 2
    images = jnp.asarray(
        rng.normal(size=(b, 3, cfg.image_size, cfg.image_size)), jnp.float32
    )
    tokens = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2, size=(b, cfg.context_length)), jnp.int32
    )
    tokens = tokens.at[:, -1].set(cfg.vocab_size - 1)
    losses = []
    for _ in range(6):
        moe, opt, metrics = step(moe, opt, images, tokens)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
