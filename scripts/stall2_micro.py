import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

big = jax.jit(lambda p, x: jnp.tanh(x @ p).sum(axis=1))
P = jax.device_put(np.random.randn(4096, 4096).astype(np.float32))
X = jax.device_put(np.random.randn(256, 4096).astype(np.float32))
small = jax.jit(lambda g: (g.mean(axis=(1,2)) > 0.5).astype(jnp.int32))
copyp = jax.jit(lambda m: m + 0)
G = np.random.randint(0,255,(256,90,160),np.uint8)

# warm everything
big(P, X).block_until_ready(); small(jnp.asarray(G)).block_until_ready(); copyp(small(jnp.asarray(G))).block_until_ready()

def wait_ready(x):
    t0=time.perf_counter()
    while not x.is_ready(): time.sleep(0.002)
    return time.perf_counter()-t0

for rep in range(6):
    m = small(jnp.asarray(G))           # scan-like tiny program
    r = big(P, X)                       # engine-like big program after it
    np.asarray(r)                       # engine fetch (sync)
    time.sleep(0.5)                     # host work gap
    t_w = wait_ready(m)
    t0=time.perf_counter(); mv = np.asarray(m); t_read=time.perf_counter()-t0
    # retry trick: device copy then read
    m2 = small(jnp.asarray(G)); r2 = big(P, X); np.asarray(r2); time.sleep(0.5)
    wait_ready(m2)
    c = copyp(m2)
    t0=time.perf_counter(); wait_ready(c); cv = np.asarray(c); t_copyread=time.perf_counter()-t0
    print(f"rep{rep}: wait={t_w*1000:6.1f}ms direct_read={t_read*1000:8.1f}ms copy_read={t_copyread*1000:8.1f}ms")
