import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
# h2d bool vs i32 vs u8
for dt in (np.bool_, np.uint8, np.int32, np.float32):
    x = np.ones(256, dt)
    jax.device_put(x).block_until_ready()
    t0=time.perf_counter()
    for _ in range(10): jax.device_put(x).block_until_ready()
    print(f"h2d {np.dtype(dt).name:8s} 256 elems: {(time.perf_counter()-t0)/10*1000:7.1f}ms")
# u8 frame block h2d
x = np.ones((256,90,160), np.uint8)
jax.device_put(x).block_until_ready()
t0=time.perf_counter()
for _ in range(5): jax.device_put(x).block_until_ready()
print(f"h2d u8 (256,90,160): {(time.perf_counter()-t0)/5*1000:.1f}ms")
# scan program time
from hippomm_tpu.ops.keyframe import KeyframeScanner
sc = KeyframeScanner(90, 160, 0.3, 1.0, block=256)
g = np.random.randint(0,255,(256,90,160),np.uint8); t=np.arange(256)/2.0
h = sc.feed(g, t); np.asarray(h)  # warm
t0=time.perf_counter()
for _ in range(3):
    h = sc.feed(g, t)
t_disp=time.perf_counter()-t0
np.asarray(h)
t_total=time.perf_counter()-t0
print(f"3 feeds dispatch={t_disp:.2f}s, +sync={t_total:.2f}s")
