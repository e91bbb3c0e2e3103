import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

# a deliberately slow program (~1s): big matmul chain
def slow(x):
    for _ in range(30):
        x = jnp.tanh(x @ x)
    return jnp.sum(x[:8], axis=0).astype(jnp.int32)  # small i32 output
f = jax.jit(slow)
x = jax.device_put(np.random.randn(4096, 4096).astype(np.float32))
r = f(x); r.block_until_ready()  # compile
t0=time.perf_counter(); r = f(x); r.block_until_ready(); t_prog=time.perf_counter()-t0
print(f"program wall: {t_prog:.2f}s")

# 1) immediate blocking asarray while program in flight
r = f(x)
t0=time.perf_counter(); m = np.asarray(r); t1=time.perf_counter()-t0
print(f"asarray-while-inflight: {t1:.2f}s")

# 2) block_until_ready then asarray
r = f(x)
t0=time.perf_counter(); r.block_until_ready(); t_bur=time.perf_counter()-t0
t0=time.perf_counter(); m = np.asarray(r); t2=time.perf_counter()-t0
print(f"block_until_ready: {t_bur:.2f}s then asarray: {t2:.3f}s")

# 3) is_ready poll then asarray
r = f(x)
t0=time.perf_counter()
while not r.is_ready(): time.sleep(0.002)
t_poll=time.perf_counter()-t0
t0=time.perf_counter(); m = np.asarray(r); t3=time.perf_counter()-t0
print(f"is_ready poll: {t_poll:.2f}s then asarray: {t3:.3f}s")
