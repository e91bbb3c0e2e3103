"""Measure the fused Pallas attention kernel vs the XLA einsum path on real TPU.

Two levels:
  1. op-level: bare attention at the tower shapes (ViT-H vision, audio trunk,
     Whisper encoder) — isolates the kernel win.
  2. tower-level: full ImageBind vision forward and Whisper encoder forward
     with HIPPOMM_FLASH_ATTN toggled — what the pipeline actually sees.

Timing protocol for tunneled devices (docs/SCALING.md transport pathologies):
dispatch REPS programs back-to-back and block on ONE final read, so per-rep
RPC latency doesn't pollute device time. First call per config is discarded
(warmup/compile).
"""

import sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.ops.flash_attention import flash_mha
from hippomm_tpu.utils.device import fetch

REPS = 8


def timed(fn, *args):
    fetch(fn(*args))  # warmup/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / REPS


def xla_attn(q, k, v, scale):
    dt = q.dtype
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w.astype(dt), v, preferred_element_type=jnp.float32
    )


def op_level():
    shapes = [
        ("vit-h b32", 32, 16, 257, 257, 80),
        ("vit-h b128", 128, 16, 257, 257, 80),
        ("audio b12", 12, 12, 230, 231, 64),
        ("whisper-enc b8", 8, 20, 1500, 1500, 64),
    ]
    for name, b, h, tq, tk, hd in shapes:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, tq, hd), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, tk, hd), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, tk, hd), jnp.bfloat16)
        scale = float(1.0 / np.sqrt(hd))
        f_xla = jax.jit(lambda q, k, v: xla_attn(q, k, v, scale))
        f_pl = jax.jit(lambda q, k, v: flash_mha(q, k, v, scale))
        # numerics cross-check on device before timing
        a = np.asarray(fetch(f_xla(q, k, v)), np.float32)
        b_ = np.asarray(fetch(f_pl(q, k, v)), np.float32)
        err = float(np.max(np.abs(a - b_)))
        t_x = timed(f_xla, q, k, v)
        t_p = timed(f_pl, q, k, v)
        print(
            f"{name:16s} xla {t_x*1e3:8.2f}ms  pallas {t_p*1e3:8.2f}ms  "
            f"speedup {t_x/t_p:5.2f}x  maxerr {err:.2e}",
            flush=True,
        )


def tower_level():
    import os
    from hippomm_tpu.models.imagebind import model as ib
    from hippomm_tpu.ops import flash_attention as fa

    cfg = ib.get_config("huge")
    params = jax.device_put(ib.init_imagebind(jax.random.PRNGKey(0), cfg))
    x = jnp.zeros((32, 3, cfg.image_size, cfg.image_size), jnp.float32)
    for mode in ("0", "1"):
        os.environ["HIPPOMM_FLASH_ATTN"] = mode
        fa.flash_default.cache_clear()
        fn = jax.jit(lambda p, v: ib.vision_forward(p, v, cfg, jnp.bfloat16))
        t = timed(fn, params, x)
        d, T, L = cfg.vision.width, cfg.vision_tokens, cfg.vision.depth
        fl = 32 * (T * L * (24.0 * d * d + 4.0 * T * d))
        print(
            f"vision b32 flash={mode}: {t*1e3:7.1f}ms  mfu={fl/t/197e12:.3f}",
            flush=True,
        )

    from hippomm_tpu.models.whisper import model as wm

    wcfg = wm.get_config("distil-large-v3")
    wparams = jax.device_put(wm.init_whisper(jax.random.PRNGKey(1), wcfg))
    mel = jnp.zeros((8, wcfg.n_mels, 2 * wcfg.max_source_positions), jnp.float32)
    for mode in ("0", "1"):
        os.environ["HIPPOMM_FLASH_ATTN"] = mode
        fa.flash_default.cache_clear()
        fn = jax.jit(lambda p, m: wm.encoder_forward(p, m, wcfg, jnp.bfloat16))
        t = timed(fn, wparams, mel)
        print(f"whisper-enc b8 flash={mode}: {t*1e3:7.1f}ms", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    op_level()
    tower_level()
