import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.models.imagebind.model import init_imagebind, tiny_config
from hippomm_tpu.parallel.mesh import make_mesh, param_shardings
from hippomm_tpu.train.checkpoint import load_params, save_params


def test_param_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, like=params)
    a = np.asarray(params["vision"]["pos_embed"])
    b = np.asarray(restored["vision"]["pos_embed"])
    np.testing.assert_array_equal(a, b)


def test_param_checkpoint_restore_sharded(tmp_path):
    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "ckpt2")
    save_params(path, params)
    mesh = make_mesh(8, model_parallel=2)
    shardings = param_shardings(params, mesh)
    restored = load_params(path, like=params, shardings=shardings)
    leaf = restored["vision"]["blocks"]["mlp"]["fc1"]["weight"]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec(None, "model", None)
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(params["vision"]["blocks"]["mlp"]["fc1"]["weight"])
    )


def test_moe_adapter_checkpoint_roundtrip_sharded(tmp_path):
    """MoE adapter params (experts sharded over "model") save and restore
    into their expert-parallel placements; values exact."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from hippomm_tpu.parallel.moe import init_moe_params, moe_specs, place_moe_params
    from jax.sharding import NamedSharding

    mesh = make_mesh(8, model_parallel=4)
    params = place_moe_params(init_moe_params(jax.random.PRNGKey(2), 32, 64, 8), mesh)
    path = str(tmp_path / "moe_ckpt")
    save_params(path, params)
    shardings = {k: NamedSharding(mesh, s) for k, s in moe_specs().items()}
    restored = load_params(path, like=params, shardings=shardings)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(restored[k]))
        assert restored[k].sharding == shardings[k]
