"""Tower-level A/B of the kernel routing flags (the decisive measurement).

The per-op micros disagree (attn_dbg's degraded-window 45.91-vs-57.78 win
for softmax_opt vs vit_op_micro's twice-measured no-win at the chain level;
row 3a's split+merge "transposes are free" reading is a no-op XLA cancels),
so decide every default where it actually matters: the full ViT-H b128
vision_forward. Each variant re-jits after flipping the routing flag (the
route is read at trace time), timing is read-synced with the floor
subtracted (bench._vision_mfu's method).

Rows: defaults / softmax_opt OFF / flash OFF (XLA einsum attention) /
fused_mlp OFF / fused_mlp "as" body.

Usage: python -u scripts/tower_ab.py   (ideally via healthy_window_runner)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from hippomm_tpu.models.imagebind import model as ib_model
from hippomm_tpu.ops import flash_attention as fa
from hippomm_tpu.ops import fused_mlp as fm
from hippomm_tpu.utils.device import fetch, warm_transport

print("transport:", warm_transport(), flush=True)

cfg = ib_model.huge_config()
params = ib_model.init_imagebind(jax.random.PRNGKey(0), cfg)
x = jnp.zeros((128, 3, cfg.image_size, cfg.image_size), jnp.float32)


def clear_routes():
    fa.flash_default.cache_clear()
    fa.softmax_opt_default.cache_clear()
    fa.bthd_default.cache_clear()
    fm.fused_mlp_default.cache_clear()
    fm._gelu_impl_flag.cache_clear()


def measure(name, env: dict, reps=5):
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    clear_routes()
    try:
        fn = jax.jit(lambda p, v: ib_model.vision_forward(p, v, cfg, jnp.bfloat16))
        fetch(fn(params, x))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(params, x) for _ in range(reps)]
        fetch(outs[-1])
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(outs[0])
        floor = time.perf_counter() - t0
        dt = max(total - floor, 0.0) / reps * 1000
        print(f"{name:28s} {dt:8.1f} ms/b128 (floor {floor * 1000:.0f} ms)", flush=True)
        return round(dt, 1)
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        clear_routes()


rows = {}
rows["defaults"] = measure("defaults (poly mlp, opt on)", {})
rows["opt_off"] = measure("softmax_opt OFF", {"HIPPOMM_FLASH_SOFTMAX_OPT": "0"})
rows["flash_off"] = measure("flash OFF (XLA einsum)", {"HIPPOMM_FLASH_ATTN": "0"})
rows["mlp_off"] = measure("fused_mlp OFF (XLA mlp)", {"HIPPOMM_FUSED_MLP": "0"})
rows["mlp_as"] = measure("fused_mlp A&S body", {"HIPPOMM_FUSED_MLP_GELU": "as"})
rows["bthd"] = measure("transpose-free bthd kernel", {"HIPPOMM_FLASH_BTHD": "1"})
rows["defaults_rep"] = measure("defaults (repeat)", {})
print(json.dumps(rows), flush=True)
