"""Attribute the short-clip encode_vision wait (clip30: ~0.9 s for ~60 frames).

Times, read-synced on the real device, for the exact product program
(`ImageBind._vision_prog`: uint8 -> resize/normalize -> ViT-H forward):
  a. host->device upload of one 32-wide 360x640 uint8 chunk (device_put alone)
  b. forward with input ALREADY on device
  c. forward from host numpy (upload + forward, as the stream dispatches)
  d. two back-to-back chunks from host numpy (the clip30 shape: 64 candidates)

Usage: python scripts/vision_dispatch_micro.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np, jax.numpy as jnp

from hippomm_tpu.config import Config
from hippomm_tpu.models.foundation import ImageBind
from hippomm_tpu.utils.device import fetch, warm_transport

print("transport:", warm_transport())
cfg = Config()
ib = ImageBind(variant="huge", model_path="")
rng = np.random.default_rng(0)
chunk = rng.integers(0, 255, (32, 360, 640, 3), dtype=np.uint8)

def timed(name, fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:58s} {dt:8.1f} ms")
    return dt

# a. upload alone (block on the transfer with a tiny reduce read)
def upload():
    x = jnp.asarray(chunk)
    fetch(x[0, 0, 0, 0].astype(jnp.int32))
timed("a. upload 32x360x640x3 uint8 (22 MB) + 1-elem read", upload)

# b. forward, input resident
xdev = jax.device_put(jnp.asarray(chunk))
fetch(xdev[0, 0, 0, 0].astype(jnp.int32))
timed("b. vision_prog fwd, input on device", lambda: fetch(ib._vision_prog(ib.params, xdev), dtype=np.float32))

# c. upload + forward (stream dispatch shape)
timed("c. vision_prog fwd from host numpy (upload+fwd)", lambda: fetch(ib._vision_prog(ib.params, jnp.asarray(chunk)), dtype=np.float32))

# d. two chunks dispatched async then both fetched (clip30's 64 candidates)
def two():
    h1 = ib._vision_prog(ib.params, jnp.asarray(chunk))
    h2 = ib._vision_prog(ib.params, jnp.asarray(chunk))
    fetch(h1, dtype=np.float32); fetch(h2, dtype=np.float32)
timed("d. 2 chunks async-dispatched, both fetched", two)
