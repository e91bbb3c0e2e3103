"""Attribute the short-clip encode_vision wait (clip30 micro's dominant stage).

History: with the fused on-device resize, uploading raw 360x640 uint8 chunks
measured ~425 ms per 32-chunk (22 MB at ~50 MB/s effective on the tunneled
transport) vs ~205 ms for the ViT-H forward itself — ingest was
upload-bandwidth-bound. The product path now resizes on HOST (PIL, the
reference's exact transform chain) and uploads only (B, 224, 224, 3) uint8.

Times, read-synced on the real device:
  a. host PIL resize+crop of one 32-wide 360x640 chunk (pure host)
  b. upload of the 32x224x224x3 uint8 crops (device_put + 1-elem read)
  c. vision_prog fwd with crops ALREADY on device (pure compute)
  d. vision_prog fwd from host crops (upload + fwd, as the stream dispatches)
  e. two chunks end-to-end from raw frames (the clip30 shape: 64 candidates)

Usage: python scripts/vision_dispatch_micro.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np, jax.numpy as jnp

from hippomm_tpu.models.foundation import ImageBind
from hippomm_tpu.ops.resize import resize_crop_u8
from hippomm_tpu.utils.device import fetch, warm_transport

print("transport:", warm_transport())
ib = ImageBind(variant="huge", model_path="")
rng = np.random.default_rng(0)
raw = rng.integers(0, 255, (32, 360, 640, 3), dtype=np.uint8)
crops = resize_crop_u8(raw, ib.cfg.image_size)

def timed(name, fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:58s} {dt:8.1f} ms")
    return dt

timed("a. host PIL resize+crop 32x360x640 -> 224 (pure host)",
      lambda: resize_crop_u8(raw, ib.cfg.image_size))

def upload():
    x = jnp.asarray(crops)
    fetch(x[0, 0, 0, 0].astype(jnp.int32))
timed("b. upload 32x224x224x3 uint8 (4.8 MB) + 1-elem read", upload)

xdev = jax.device_put(jnp.asarray(crops))
fetch(xdev[0, 0, 0, 0].astype(jnp.int32))
timed("c. vision_prog fwd, crops on device",
      lambda: fetch(ib._vision_prog(ib.params, xdev), dtype=np.float32))

timed("d. vision_prog fwd from host crops (upload+fwd)",
      lambda: fetch(ib._vision_prog(ib.params, jnp.asarray(crops)), dtype=np.float32))

def two():
    c1 = resize_crop_u8(raw, ib.cfg.image_size)
    h1 = ib._vision_prog(ib.params, jnp.asarray(c1))
    c2 = resize_crop_u8(raw, ib.cfg.image_size)
    h2 = ib._vision_prog(ib.params, jnp.asarray(c2))
    fetch(h1, dtype=np.float32); fetch(h2, dtype=np.float32)
timed("e. 2 chunks from raw frames (resize+upload+fwd, async)", two)
