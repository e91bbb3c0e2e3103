import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np, jax.numpy as jnp
from hippomm_tpu.models.imagebind import model as ib_model
cfg = ib_model.get_config("huge")
params = jax.device_put(ib_model.init_imagebind(jax.random.PRNGKey(0), cfg))
fn = jax.jit(lambda p, v: ib_model.vision_forward(p, v, cfg, jnp.bfloat16))
def flops(b):
    d, T, L = cfg.vision.width, cfg.vision_tokens, cfg.vision.depth
    per = 24.0*d*d + 4.0*T*d
    return b*(T*L*per + 2.0*(T-1)*d*3*cfg.patch_size**2 + 2.0*d*cfg.embed_dim)
for b in (32, 64, 128):
    x = jnp.zeros((b, 3, cfg.image_size, cfg.image_size), jnp.float32)
    from hippomm_tpu.utils.device import fetch
    fetch(fn(params, x))
    t0=time.perf_counter(); reps=4
    for _ in range(reps):
        out = fetch(fn(params, x))
    dt=(time.perf_counter()-t0)/reps
    print(f"b={b:4d}: {dt*1000:7.1f}ms  {flops(b)/dt/1e12:6.1f} TF/s  mfu={flops(b)/dt/197e12:.3f}")
