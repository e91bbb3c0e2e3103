"""Shared transformer building blocks (pure-function JAX, param pytrees).

Used by every tower in the model layer (ImageBind vision/audio/text, Whisper
encoder/decoder). Conventions:
  * params are nested dicts of jnp arrays; functions are pure and jit-safe
  * matmuls run in `compute_dtype` (bfloat16 on TPU → MXU) with fp32 accumulation
  * LayerNorm always runs in fp32 (numerical parity with the torch references)
  * weights follow torch Linear convention: W (out, in), y = x @ W.T + b,
    so converted checkpoints drop in without transposes
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def linear(p: Params, x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    w = p["weight"].astype(dtype)
    y = jnp.dot(x.astype(dtype), w.T, preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-6, out_dtype=None) -> jax.Array:
    """Stats and affine always in fp32 (parity with the torch references);
    out_dtype casts the WRITE — inside a bf16 block the fp32 LN output would
    otherwise double the HBM traffic of the materialized activation."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y if out_dtype is None else y.astype(out_dtype)


def gelu(x: jax.Array) -> jax.Array:
    # exact (erf) GELU — torch nn.GELU default
    return jax.nn.gelu(x, approximate=False)


def attention(
    p: Params,
    x_q: jax.Array,
    x_kv: Optional[jax.Array] = None,
    num_heads: int = 8,
    mask: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Multi-head attention with torch packed-in_proj convention.

    p: {"in_proj": {"weight" (3D, D), "bias" (3D,)}, "out_proj": {...}}
    or separate {"q_proj","k_proj","v_proj","out_proj"} (Whisper/HF style).
    x_q: (B, Tq, D); x_kv: (B, Tk, D) for cross-attention (defaults to x_q).
    mask: additive fp32 (Tq, Tk) or (B, 1, Tq, Tk); -inf for masked.
    """
    if x_kv is None:
        x_kv = x_q
    d = x_q.shape[-1]
    hd = d // num_heads

    if "in_proj" in p:
        w = p["in_proj"]["weight"]
        b = p["in_proj"].get("bias")
        if x_kv is x_q:
            # self-attention: ONE (D, 3D) matmul — reads x once and gives the
            # MXU a 3x-wider op; slicing the output columns is numerically
            # identical to three per-slice matmuls (same dot products).
            qkv = jnp.dot(x_q.astype(dtype), w.T.astype(dtype), preferred_element_type=jnp.float32)
            if b is not None:
                qkv = qkv + b.astype(jnp.float32)
            q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
        else:
            q = jnp.dot(x_q.astype(dtype), w[:d].T.astype(dtype), preferred_element_type=jnp.float32)
            kv = jnp.dot(
                x_kv.astype(dtype), w[d:].T.astype(dtype), preferred_element_type=jnp.float32
            )
            if b is not None:
                q = q + b[:d].astype(jnp.float32)
                kv = kv + b[d:].astype(jnp.float32)
            k, v = kv[..., :d], kv[..., d:]
    else:
        q = linear(p["q_proj"], x_q, dtype)
        k = linear(p["k_proj"], x_kv, dtype)
        v = linear(p["v_proj"], x_kv, dtype)
    # every consumer below casts to `dtype` anyway (logit/value einsums), so
    # casting here is numerically identical — and it halves the HBM bytes the
    # head-split transposes move (they materialized fp32 copies before).
    q, k, v = q.astype(dtype), k.astype(dtype), v.astype(dtype)

    if "bias_k" in p:
        # torch MultiheadAttention add_bias_kv=True (ImageBind audio trunk):
        # one learned K/V position appended post-projection to every row
        bsz = k.shape[0]
        bk = jnp.broadcast_to(p["bias_k"].reshape(1, 1, d), (bsz, 1, d)).astype(dtype)
        bv = jnp.broadcast_to(p["bias_v"].reshape(1, 1, d), (bsz, 1, d)).astype(dtype)
        k = jnp.concatenate([k, bk], axis=1)
        v = jnp.concatenate([v, bv], axis=1)
        if mask is not None:  # appended position is always attendable
            pad = [(0, 0)] * (mask.ndim - 1) + [(0, 1)]
            mask = jnp.pad(mask, pad)

    scale = 1.0 / np.sqrt(hd)
    if mask is None:
        # transpose-free route: the fused kernel ingests the NATIVE
        # (B, T, H, hd) layout the qkv reshape produces, so the three head
        # split transposes, the (B·H, T, hd) fold+pad, and the output merge
        # transpose — four (B, T, D)-sized layout moves per layer that
        # contribute zero FLOPs — vanish from the program. Gated by
        # bthd_default() pending the healthy-window measurement
        # (scripts/vit_op_micro.py row 6 vs row 1).
        from hippomm_tpu.ops.flash_attention import (
            bthd_default,
            bthd_supported,
            flash_default,
            flash_mha_bthd,
        )

        if flash_default() and bthd_default():
            bq, tq_ = q.shape[0], q.shape[1]
            tk_ = k.shape[1]
            if bthd_supported(bq, num_heads, tq_, tk_, hd):
                out = flash_mha_bthd(
                    q.reshape(bq, tq_, num_heads, hd),
                    k.reshape(bq, tk_, num_heads, hd),
                    v.reshape(bq, tk_, num_heads, hd),
                    float(scale),
                )
                return linear(p["out_proj"], out.reshape(bq, tq_, d), dtype)

    def split(t):  # (B, T, D) -> (B, H, T, hd)
        b_, t_, _ = t.shape
        return t.reshape(b_, t_, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    if mask is None:
        # mask-free attention routes to the fused Pallas kernel on TPU for
        # EVERY supported shape — Whisper encoder (hd=64, 828→672 ms tower
        # fwd), ImageBind audio trunk (hd=64, 1.15× op-level), and since the
        # G-blocked grid also ViT-H (hd=80: 32-layer b128 chain 113.4→97.3 ms)
        # — see flash_profitable for the measured margins. The win is the
        # removed (B, H, Tq, Tk) softmax HBM round-trip. Numerics are
        # structurally identical (fp32 logits/softmax, dtype value matmul,
        # fp32 accumulation); parity pinned by tests/test_flash_attn.py.
        from hippomm_tpu.ops.flash_attention import (
            flash_default,
            flash_mha,
            flash_profitable,
            softmax_opt_default,
        )

        if flash_default() and flash_profitable(q.shape[2], k.shape[2], hd):
            out = flash_mha(q, k, v, float(scale), False, softmax_opt_default())
            b_, h_, t_, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b_, t_, d)
            return linear(p["out_proj"], out, dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(dtype), k.astype(dtype), preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights.astype(dtype),
        v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    b_, h_, t_, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b_, t_, d)
    return linear(p["out_proj"], out, dtype)


def mlp(p: Params, x: jax.Array, dtype=jnp.bfloat16, cast_out: bool = False) -> jax.Array:
    """fc1 keeps fp32 accumulation (+ fp32 bias), then casts to the compute
    dtype BEFORE the GELU: the (B, T, 4D) hidden is the largest activation in
    the model (337 MB fp32 at ViT-H b128), and running the GELU's read/write
    in bf16 halves its HBM traffic. dtype=fp32 is bit-identical to the old
    gelu-then-cast order (parity tests run fp32); in bf16 the difference is
    one rounding of the GELU input, bounded by bf16 eps.

    cast_out=True declares the CALLER immediately casts the result to `dtype`
    (every residual-stream call site does) — permission for the fused Pallas
    kernel (ops/fused_mlp.py: fc1→bias→GELU→fc2 in one pass, hidden never in
    HBM, GELU overlaps the MXU) to emit the compute dtype directly. Values
    after the caller's cast are bit-identical either way; the one call site
    that keeps the fp32 output (whisper decoder single-token step) must not
    pass it. Routing is gated by fused_mlp_default() (measurement pending)."""
    if cast_out and "bias" in p["fc1"] and "bias" in p["fc2"]:
        from hippomm_tpu.ops import fused_mlp as _fm

        w1 = p["fc1"]["weight"]
        f, d = w1.shape
        n = int(np.prod(x.shape[:-1]))
        if _fm.fused_mlp_default() and _fm.fused_mlp_supported(n, d, f):
            y = _fm.fused_mlp_vjp(
                x.reshape(n, d).astype(dtype),
                w1, p["fc1"]["bias"], p["fc2"]["weight"], p["fc2"]["bias"],
            )
            return y.reshape(*x.shape[:-1], d)
    y = linear(p["fc1"], x, dtype).astype(dtype)
    return linear(p["fc2"], gelu(y), dtype)


def encoder_block(
    p: Params,
    x: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Pre-LN transformer block: x + attn(ln1(x)); x + mlp(ln2(x)).

    The residual STREAM is kept in `dtype` (AMP-style): with bf16 compute, an
    fp32 stream was measured to halve effective matmul throughput on v5e —
    every materialized activation (LN outputs, residual carries) pays double
    HBM bytes. LN statistics still run fp32; dtype=fp32 is bit-identical to
    the previous behavior (parity tests run fp32)."""
    x = x.astype(dtype)
    x = x + attention(
        p["attn"], layer_norm(p["norm_1"], x, eps, out_dtype=dtype),
        num_heads=num_heads, mask=mask, dtype=dtype,
    ).astype(dtype)
    return _mlp_halfblock(p, x, eps, dtype)


def _mlp_halfblock(p: Params, x: jax.Array, eps: float, dtype) -> jax.Array:
    """x + mlp(ln2(x)) — optionally ONE Pallas kernel (ops/fused_mlp.py:
    fused_ln_mlp_residual: LN prologue + fc1/GELU/fc2 + residual epilogue on
    the once-read x-tile), gated by fused_block_default() (default OFF
    pending hardware measurement). Values match the unfused path to the
    fused-MLP tolerances; the LN and residual arithmetic is bit-equal."""
    pm = p["mlp"]
    # x.dtype == dtype gate: the fused kernel computes in (and emits) x.dtype,
    # the unfused path in `dtype` — encoder_block always casts x first so the
    # routes agree today, but a direct caller with x.dtype != dtype must get
    # identical numerics from both routes (ADVICE r4 #3)
    if ("bias" in pm.get("fc1", {}) and "bias" in pm.get("fc2", {})
            and x.dtype == dtype):
        from hippomm_tpu.ops import fused_mlp as _fm

        w1 = pm["fc1"]["weight"]
        f, d = w1.shape
        n = int(np.prod(x.shape[:-1]))
        if _fm.fused_block_default() and _fm.fused_mlp_supported(n, d, f):
            y = _fm.fused_ln_mlp_residual_vjp(
                x.reshape(n, d),
                p["norm_2"]["weight"], p["norm_2"]["bias"],
                w1, pm["fc1"]["bias"], pm["fc2"]["weight"], pm["fc2"]["bias"],
                eps,
            )
            return y.reshape(x.shape)
    return x + mlp(
        pm, layer_norm(p["norm_2"], x, eps, out_dtype=dtype), dtype=dtype,
        cast_out=True,
    ).astype(dtype)


def stacked_blocks(
    p_blocks: Params,
    x: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
    dtype=jnp.bfloat16,
    remat: bool = False,
) -> jax.Array:
    """Run a stack of identical blocks via lax.scan over stacked params.

    p_blocks: pytree whose leaves have a leading (depth,) axis. One compiled
    block body regardless of depth — fast compiles, and `remat` trades memory
    for recompute when training.
    """

    def body(h, pb):
        fn = encoder_block
        if remat:
            fn = jax.checkpoint(encoder_block, static_argnums=(2, 4, 5))
        h = fn(pb, h, num_heads, mask, eps, dtype)
        return h, None

    # the scan carry must keep one dtype; blocks run the stream in `dtype`
    x, _ = jax.lax.scan(body, x.astype(dtype), p_blocks)
    return x


def stack_block_params(block_list) -> Params:
    """List of per-block param dicts -> single dict with stacked (depth-first) leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_list)


# ---------------------------------------------------------------------------
# Initializers (for hermetic tiny configs and training-from-scratch)
# ---------------------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(d_in)
    p = {"weight": jax.random.uniform(k1, (d_out, d_in), jnp.float32, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(d: int) -> Params:
    return {"weight": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_attention(
    key, d: int, packed: bool = True, bias: bool = True, bias_kv: bool = False
) -> Params:
    k1, k2 = jax.random.split(key)
    if packed:
        scale = 1.0 / np.sqrt(d)
        p = {
            "in_proj": {
                "weight": jax.random.uniform(k1, (3 * d, d), jnp.float32, -scale, scale),
            },
            "out_proj": init_linear(k2, d, d, bias=bias),
        }
        if bias:
            p["in_proj"]["bias"] = jnp.zeros((3 * d,), jnp.float32)
        if bias_kv:
            # random-init convenience only (torch uses xavier_normal_; real
            # checkpoints overwrite these via the converter, so exact init
            # parity is immaterial — 0.02·normal keeps the scale sane)
            k3, k4 = jax.random.split(jax.random.fold_in(key, 7))
            p["bias_k"] = 0.02 * jax.random.normal(k3, (1, 1, d), jnp.float32)
            p["bias_v"] = 0.02 * jax.random.normal(k4, (1, 1, d), jnp.float32)
        return p
    k1a, k1b, k1c = jax.random.split(k1, 3)
    return {
        "q_proj": init_linear(k1a, d, d, bias=bias),
        "k_proj": init_linear(k1b, d, d, bias=bias),
        "v_proj": init_linear(k1c, d, d, bias=bias),
        "out_proj": init_linear(k2, d, d, bias=bias),
    }


def init_block(
    key, d: int, mlp_ratio: float = 4.0, packed: bool = True, bias_kv: bool = False
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(d * mlp_ratio)
    return {
        "attn": init_attention(k1, d, packed=packed, bias_kv=bias_kv),
        "mlp": {"fc1": init_linear(k2, d, hidden), "fc2": init_linear(k3, hidden, d)},
        "norm_1": init_layer_norm(d),
        "norm_2": init_layer_norm(d),
    }
