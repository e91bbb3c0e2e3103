"""Dissect the ViT-H b128 forward's non-matmul wall (SCALING.md MFU section).

Measures, read-synced, at the flagship encode shape (B=128, T=257, D=1280,
H=16, hd=80, 32 layers):
  1. attention chain as the model runs it (split transposes + flash kernel
     incl. its fold/pad + merge transpose)
  2. the pallas kernel alone on pre-padded (g, T', hd') inputs
  3. the split/merge transposes + the kernel's fold/pad, isolated
  4. MLP as shipped (fp32 matmul out -> fp32 gelu -> cast) vs bf16-epilogue
     variant (bf16 matmul out + bf16 bias -> bf16 gelu)
  5. LN + residual chain alone
Each row: ms per 32-layer chain, so numbers compare directly to the
466-470 ms tower forward and the 97.3 ms attention-chain measurement.

Usage: python scripts/vit_op_micro.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np, jax.numpy as jnp
from functools import partial

from hippomm_tpu.utils.device import fetch, warm_transport
import hippomm_tpu.models.layers as L
from hippomm_tpu.ops.flash_attention import _flash_mha_fwd_impl, flash_mha

B, T, D, H, LAYERS = 128, 257, 1280, 16, 32
HD = D // H
SCALE = 1.0 / np.sqrt(HD)

print("transport:", warm_transport())
key = jax.random.PRNGKey(0)
x = jax.device_put(jax.random.normal(key, (B, T, D), jnp.bfloat16))
w_qkv = jax.device_put(0.02 * jax.random.normal(key, (3 * D, D), jnp.float32))
b_qkv = jax.device_put(jnp.zeros((3 * D,), jnp.float32))
w1 = jax.device_put(0.02 * jax.random.normal(key, (4 * D, D), jnp.float32))
b1 = jax.device_put(jnp.zeros((4 * D,), jnp.float32))
w2 = jax.device_put(0.02 * jax.random.normal(key, (D, 4 * D), jnp.float32))
b2 = jax.device_put(jnp.zeros((D,), jnp.float32))
lnp = {"weight": jax.device_put(jnp.ones((D,), jnp.float32)),
       "bias": jax.device_put(jnp.zeros((D,), jnp.float32))}


def chain(fn, n=LAYERS):
    """fold fn n times so per-call dispatch overhead amortizes like the model.
    Returns a SCALAR reduction of the final carry: syncing via an 84 MB fetch
    made the read floor (seconds, +-50% on this tunnel) swamp the 50-150 ms
    signal — a 4-byte read's floor is just the RPC latency."""
    @jax.jit
    def run(x0):
        def body(h, _):
            return fn(h), None
        out, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(out[..., :1, :1].astype(jnp.float32))
    return run


def bench(name, run, x0, reps=8):
    """Read-synced timing with the read floor subtracted (as bench.py's
    _vision_mfu does): fetching the 84 MB output inside the timed loop made
    every row transport-dominated on a tunneled link — dispatch all reps
    async, sync via one read, then subtract a ready-buffer read's cost."""
    fetch(run(x0))  # compile + warm
    t0 = time.perf_counter()
    outs = [run(x0) for _ in range(reps)]
    fetch(outs[-1])
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(outs[0])  # ready buffer: fixed read floor
    floor = time.perf_counter() - t0
    dt = max(total - floor, 0.0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms /{LAYERS}L  (read floor {floor*1000:.0f} ms)",
          flush=True)
    return dt


def split(t):  # (B, T, D) -> (B, H, T, hd)
    return t.reshape(B, T, H, HD).transpose(0, 2, 1, 3)


# 1. attention chain exactly as attention() runs it (flash path, post-qkv)
def attn_as_model(h):
    qkv = jnp.dot(h, w_qkv.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    qkv = qkv + b_qkv
    q, k, v = (qkv[..., :D].astype(jnp.bfloat16), qkv[..., D:2 * D].astype(jnp.bfloat16),
               qkv[..., 2 * D:].astype(jnp.bfloat16))
    o = flash_mha(split(q), split(k), split(v), float(SCALE))
    return o.transpose(0, 2, 1, 3).reshape(B, T, D).astype(jnp.bfloat16)


# 1b. same chain with the r4 softmax-floor optimizations (CLS-split +
# fast-exp) — the product path when softmax_opt_default() flips on
def attn_opt(h):
    qkv = jnp.dot(h, w_qkv.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    qkv = qkv + b_qkv
    q, k, v = (qkv[..., :D].astype(jnp.bfloat16), qkv[..., D:2 * D].astype(jnp.bfloat16),
               qkv[..., 2 * D:].astype(jnp.bfloat16))
    o = flash_mha(split(q), split(k), split(v), float(SCALE), False, True)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D).astype(jnp.bfloat16)


# 2. kernel alone on pre-split (B, H, T, hd) inputs (incl. its fold/pad)
q0 = jax.device_put(jax.random.normal(key, (B, H, T, HD), jnp.bfloat16))
def kernel_only(q):
    return _flash_mha_fwd_impl(q, q, q, float(SCALE)).astype(jnp.bfloat16)


# 3a. split/merge transposes alone
def transposes_only(h):
    q = split(h)
    return q.transpose(0, 2, 1, 3).reshape(B, T, D)


# 3b. the kernel's fold+pad alone (what _flash_mha_fwd_impl does pre-call)
HDP, TKP = 128, 384
def foldpad_only(q):
    t = q.reshape(B * H, T, HD)
    t = jnp.pad(t, ((0, 0), (0, TKP - T), (0, HDP - HD)))
    return t[:, :T, :HD].reshape(B, H, T, HD)


# 4a. MLP as shipped: fp32 matmul out -> bias -> exact gelu -> cast at fc2
def mlp_shipped(h):
    y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b1
    y = jax.nn.gelu(y, approximate=False)
    z = jnp.dot(y.astype(jnp.bfloat16), w2.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2
    return z.astype(jnp.bfloat16)


# 4b. bf16-epilogue variant: matmul emits bf16, bias+gelu in bf16
def mlp_bf16(h):
    y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.bfloat16)
    y = jax.nn.gelu(y + b1.astype(jnp.bfloat16), approximate=False)
    z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
    return z.astype(jnp.bfloat16)


# 4c. fp32 accum, fused cast before gelu (gelu in bf16, accum precision kept)
def mlp_bf16_gelu(h):
    y = jnp.dot(h, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    y = (y + b1).astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    z = jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b2
    return z.astype(jnp.bfloat16)


# 5. LN + residual chain alone (2 LN + 2 adds per layer, like encoder_block)
def ln_res(h):
    a = L.layer_norm(lnp, h, 1e-6, out_dtype=jnp.bfloat16)
    h = h + a
    b = L.layer_norm(lnp, h, 1e-6, out_dtype=jnp.bfloat16)
    return h + b


# 6. Transpose-free attention (r4, now the PRODUCT kernel in
# ops/flash_attention.py): ingests the natural (B, T, H, hd) layout the qkv
# reshape produces — no split/merge transposes, no fold, no explicit hd/Tk
# padding (Mosaic masks partial tiles). If this beats attn_as_model by ~the
# transpose+foldpad wall, flip bthd_default() to backend-gated.
from hippomm_tpu.ops.flash_attention import flash_mha_bthd


def attn_bthd(hh):
    qkv = jnp.dot(hh, w_qkv.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    qkv = (qkv + b_qkv).astype(jnp.bfloat16)
    q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]  # as attention() slices
    o = flash_mha_bthd(q.reshape(B, T, H, HD), k.reshape(B, T, H, HD),
                       v.reshape(B, T, H, HD), float(SCALE))
    return o.reshape(B, T, D)  # free: no transpose


def check_bthd_correct():
    qs = jax.random.normal(jax.random.PRNGKey(1), (2, 37, 8, 80), jnp.float32)
    ks = jax.random.normal(jax.random.PRNGKey(2), (2, 37, 8, 80), jnp.float32)
    vs = jax.random.normal(jax.random.PRNGKey(3), (2, 37, 8, 80), jnp.float32)
    got = flash_mha_bthd(qs, ks, vs, 0.1)
    ref = _flash_mha_fwd_impl(
        qs.transpose(0, 2, 1, 3), ks.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1, 3), 0.1
    ).transpose(0, 2, 1, 3)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"bthd kernel max abs err vs product kernel: {err:.2e}")
    return err < 1e-5


# 7. qkv dissection: matmul + bias + cast + slices, STOPPING before any
# layout work — attn chain minus this minus the kernel = the layout wall
def qkv_only(h):
    qkv = jnp.dot(h, w_qkv.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    qkv = (qkv + b_qkv).astype(jnp.bfloat16)
    q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
    return (q + k + v)  # consume all three slices; one extra add pair


# 8. fused MLP kernel (ops/fused_mlp.py): fc1 -> bias -> bf16 gelu -> fc2 in
# one pallas call; the (B,T,4D) hidden never leaves VMEM and the erf GELU
# overlaps the MXU. Compare against 4a (the shipped XLA path).
from hippomm_tpu.ops.fused_mlp import fused_mlp


def mlp_fused(h):
    y = fused_mlp(h.reshape(B * T, D), w1, b1, w2, b2)
    return y.reshape(B, T, D)


def check_mlp_fused_correct():
    # oracle is the kernel's OWN op order (A&S erf in fp32 on the bf16
    # hidden): comparing against 4c's exact-gelu op order reads ~5e-1 here —
    # NOT a kernel bug but accumulated ±1-ulp bf16 gelu differences over the
    # 5120-dim contraction amplified by max-rel on near-zero outputs
    # (scripts/fused_verdict.py, 2026-08-21)
    from hippomm_tpu.ops.fused_mlp import _erf_as

    hh = jax.random.normal(jax.random.PRNGKey(4), (256, D), jnp.float32)
    got = fused_mlp(hh.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), b1,
                    w2.astype(jnp.bfloat16), b2, False, "as")
    hb = hh.astype(jnp.bfloat16)
    y = jnp.dot(hb, w1.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    y = (y + b1).astype(jnp.bfloat16)
    y = 0.5 * y.astype(jnp.float32) * (
        1.0 + _erf_as(y.astype(jnp.float32) * 0.7071067811865476)
    )
    y = y.astype(jnp.bfloat16)
    want = (jnp.dot(y, w2.T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            + b2).astype(jnp.bfloat16)
    g = got.astype(jnp.float32)
    w = want.astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(g - w) / (jnp.abs(w) + 1e-2)))
    print(f"fused mlp max rel err vs own op order (bf16): {rel:.2e}")
    return rel < 3e-2


rows = {}
try:
    ok = check_bthd_correct()
    if ok:
        rows["attn_bthd_no_transpose"] = bench(
            "6. attn chain, transpose-free bthd kernel", chain(attn_bthd), x
        )
except Exception as e:
    print(f"bthd kernel failed: {e!r}"[:300])

try:
    if check_mlp_fused_correct():
        rows["mlp_fused"] = bench("8. MLP fused pallas kernel", chain(mlp_fused), x)
except Exception as e:
    print(f"fused mlp kernel failed: {e!r}"[:300])

rows["qkv_only"] = bench("7. qkv matmul+bias+cast+slices only", chain(qkv_only), x)

rows["attn_chain_as_model"] = bench("1. attn chain (model path, post-qkv)", chain(attn_as_model), x)
try:
    rows["attn_chain_softmax_opt"] = bench("1b. attn chain (softmax_opt)", chain(attn_opt), x)
except Exception as e:
    print(f"softmax_opt chain failed: {e!r}"[:300])
rows["kernel_only"] = bench("2. pallas kernel alone (pre-split inputs)", chain(kernel_only), q0)
rows["transposes_only"] = bench("3a. split+merge transposes alone", chain(transposes_only), x)
rows["foldpad_only"] = bench("3b. kernel fold+pad alone", chain(foldpad_only), q0)
rows["mlp_shipped"] = bench("4a. MLP shipped (fp32 out -> gelu -> cast)", chain(mlp_shipped), x)
rows["mlp_bf16"] = bench("4b. MLP bf16 epilogue (bias+gelu bf16)", chain(mlp_bf16), x)
rows["mlp_bf16_gelu"] = bench("4c. MLP fp32 accum, gelu in bf16", chain(mlp_bf16_gelu), x)
rows["ln_res"] = bench("5. LN+residual chain (2 LN + 2 adds)", chain(ln_res), x)

import json
print(json.dumps({k: round(v, 2) for k, v in rows.items()}))
