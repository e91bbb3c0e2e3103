"""Pallas TPU kernel: fused multi-head attention (softmax never leaves VMEM).

The XLA attention path (models/layers.py:attention) materializes the
(B, H, Tq, Tk) logit tensor in HBM between the two einsums — for the Whisper
encoder (Tk = 1500, H = 20) that is ~180 MB of fp32 round-trip PER LAYER per
chunk batch, and for ViT-H vision encode (Tk = 257, H = 16, B = 32) ~135 MB
per block. Attention is ~3 % of the model FLOPs but a large share of the HBM
bytes, so on a bandwidth-bound chip the einsum pair runs far from
speed-of-light.

This kernel computes logits → softmax → weighted-sum entirely in VMEM per
(head, q-block) grid step: HBM traffic collapses to q/k/v once in and the
output once out. Our sequence lengths (257 vision / 230 audio / 1500 Whisper
encoder) let a whole head's K and V sit in VMEM, so no online-softmax
streaming is needed — one exact softmax per q-block, numerically identical
in structure to the XLA path (fp32 logits/softmax, compute-dtype value
matmul, fp32 accumulation).

Layout notes (pallas_guide.md: tiling): head_dim (80 for ViT-H, 64 for
Whisper) is zero-padded to the 128-lane MXU width — padded K columns
contribute 0 to q·k, padded V columns write zeros that the caller slices
away. Tk pads to a lane multiple with -inf logit masking so softmax mass
stays on real keys; padded q rows compute garbage that is sliced away.

Differentiable via custom_vjp: the backward pass recomputes the standard
attention gradients with XLA einsums (training is the rare path here —
ingest/serving never differentiates through attention).

Reference behavior being accelerated: torch F.multi_head_attention_forward
inside ImageBind/Whisper (reference hippomm/models/foundation_models.py
delegates to the stock towers); numerics pinned by tests/test_flash_attn.py
against the einsum path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -3.0e38  # finite -inf stand-in: exp() flushes to 0, no NaN from (-inf) - (-inf)
# Per-step VMEM budget guard: beyond this Tk the (TQ, TKp) logit block plus
# K/V no longer comfortably fit and the XLA path should handle it.
_MAX_TK = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --- fast exp for the softmax (bf16 compute only) -------------------------
# exp(x) for x ≤ 0 (post max-subtraction) as 2^n · 2^r: n via int bitcast,
# 2^r by a degree-6 Taylor polynomial (max rel err ~1e-5 on [-87, 0] — ~400×
# under bf16 weight resolution). The VPU's transcendental exp retires far
# fewer lanes per cycle than mul/add; the polynomial runs at mul/add rate.
_LOG2E = 1.4426950408889634
_EXP2_C = (1.0, 0.6931471805599453, 0.2402265069591007, 0.05550410866482158,
           0.009618129107628477, 0.0013333558146428443, 0.0001540353039338161)


def _fast_exp(x):
    z = x * _LOG2E
    z = jnp.maximum(z, -126.0)
    n = jnp.floor(z)
    r = z - n  # [0, 1)
    c = _EXP2_C
    p = c[0] + r * (c[1] + r * (c[2] + r * (c[3] + r * (c[4] + r * (c[5] + r * c[6])))))
    pow2n = jax.lax.bitcast_convert_type(
        ((n.astype(jnp.int32) + 127) << 23), jnp.float32
    )
    return p * pow2n


def _mha_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, tk_valid: int,
    cls_split: bool = False, fast_exp: bool = False, defer_div: bool = False,
):
    """One grid step: full attention for G_BLK (batch·head) units × one q-block.

    q_ref: (G, TQ, HD); k_ref/v_ref: (G, TKp, HD); o_ref: (G, TQ, HD) in the
    COMPUTE dtype — the only consumer (the out-projection matmul) casts to it
    anyway, so emitting it here is numerically identical to fp32-out-then-cast
    while halving the kernel's output HBM bytes AND the merge transpose that
    follows (~170 MB/layer of fp32 out at ViT-H b128).

    G units per step (statically unrolled) amortize the per-step grid cost:
    at ViT-H b128 the grid is 2048 (batch·head) units, and one-unit steps
    spent more on step overhead than on the (272, 128)×(128, 384) matmuls —
    measured 3.9 ms/layer vs XLA's 3.6; blocking G=8 units per step cuts the
    step count 8× and the same math wins (see flash_profitable)."""
    ex = _fast_exp if fast_exp else jnp.exp
    for u in range(q_ref.shape[0]):
        q = q_ref[u]
        k = k_ref[u]
        if cls_split:
            # Caller rolled keys so the single odd key (ViT's CLS token) is
            # row tk_valid-1 and rows 0..tk_valid-2 are an exact lane
            # multiple: every softmax pass runs on the (TQ, tk_valid-1)
            # block (2 vregs at Tk=257 instead of the 3-vreg 384-lane padded
            # block) and the padded-key mask disappears. The odd key is a
            # rank-1 escape merged into max/sum/output; the division is
            # deferred to the (TQ, HDp) output — 1/3 the area of the
            # (TQ, TKp) weight division.
            main = tk_valid - 1  # static lane multiple (gate: cls_splittable)
            tq_blk, hdp = q.shape
            lm = jax.lax.dot_general(
                q, k[0:main, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            # the CLS row via broadcast·multiply·lane-reduce: N=1 matmuls
            # (and (TQ,1)×(1,HDp) broadcast products) trip Mosaic's
            # vector.broadcast elt-type verifier (probed 2026-08-20)
            kc = jnp.broadcast_to(k[main:main + 1, :], (tq_blk, hdp)).astype(jnp.float32)
            lc = jnp.sum(q.astype(jnp.float32) * kc, axis=-1, keepdims=True) * scale
            m = jnp.maximum(jnp.max(lm, axis=-1, keepdims=True), lc)
            em = ex(lm - m)
            ec = ex(lc - m)
            s = jnp.sum(em, axis=-1, keepdims=True) + ec
            o = jnp.dot(
                em.astype(q.dtype), v_ref[u, 0:main, :],
                preferred_element_type=jnp.float32,
            )
            vc = jnp.broadcast_to(v_ref[u, main:main + 1, :], (tq_blk, hdp)).astype(jnp.float32)
            o = o + jnp.broadcast_to(ec, (tq_blk, hdp)) * vc
            o_ref[u] = (o * (1.0 / s)).astype(o_ref.dtype)
            continue
        # (TQ, TKp) fp32 logits — lives only in VMEM
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        tkp = k.shape[0]
        if tk_valid < tkp:  # static: mask zero-padded keys out of the softmax
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < tk_valid, logits, _NEG)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = ex(logits - m)
        if defer_div:
            # divide the (TQ, HDp) OUTPUT instead of the (TQ, TKp) weights —
            # 1/3 the VPU area at ViT shapes (hd 128 lanes vs Tk 384), and one
            # fewer full-width elementwise pass. Measured 49.37 vs 57.78
            # ms/32L at ViT-H b128 (scripts/attn_dbg.py row b, 2026-08-21).
            s = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(
                e.astype(q.dtype), v_ref[u], preferred_element_type=jnp.float32
            )
            o_ref[u] = (o * (1.0 / s)).astype(o_ref.dtype)
        else:
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            o_ref[u] = jnp.dot(
                w.astype(q.dtype), v_ref[u], preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def cls_splittable(tk: int) -> bool:
    """True when Tk is one past a lane multiple (ViT towers: 16² patches +
    CLS = 257) — the shape where the padded softmax wastes a full extra
    128-lane vreg on a single key and the CLS-split schedule pays off."""
    return tk > _LANES and (tk - 1) % _LANES == 0


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "softmax_opt"))
def _flash_mha_fwd_impl(
    q, k, v, scale: float, interpret: bool = False, softmax_opt: bool = False
):
    """q: (B, H, Tq, hd); k/v: (B, H, Tk, hd) — returns (B, H, Tq, hd) in
    q.dtype (fp32 in → fp32 out; bf16 in → bf16 out, same values as the old
    fp32 output after the consumer's cast).

    softmax_opt=True enables the measured softmax-floor optimizations where
    they apply: the CLS-split schedule for Tk ≡ 1 (mod 128) and the deferred
    output division for every other shape (values within one bf16 ulp of the
    legacy body — see scripts/attn_dbg.py and tests/test_flash_attn.py; the
    polynomial fast-exp measured a loss and sits behind
    HIPPOMM_FLASH_FASTEXP)."""
    b, h, tq, hd = q.shape
    tk = k.shape[2]
    cls_split = softmax_opt and cls_splittable(tk)
    # fast-exp measured a LOSS at ViT-H b128 (66.89 vs 57.78 ms/32L product,
    # 53.78 vs 45.91 under CLS-split — attn_dbg rows c/f vs a/g, 2026-08-21):
    # the exp is not the bottleneck once the division is deferred, and the
    # polynomial's extra mul/adds contend with the softmax's own VPU work.
    # Kept behind HIPPOMM_FLASH_FASTEXP=1 as a measured-loss reference.
    fast_exp = (
        softmax_opt and q.dtype == jnp.bfloat16 and _fast_exp_enabled()
    )
    if cls_split:
        # roll keys/values one left: the odd key (row 0, ViT's CLS) moves to
        # row tk-1; attention is permutation-invariant over keys
        k = jnp.concatenate([k[:, :, 1:, :], k[:, :, :1, :]], axis=2)
        v = jnp.concatenate([v[:, :, 1:, :], v[:, :, :1, :]], axis=2)
    g = b * h
    hdp = _round_up(hd, _LANES)
    tkp = _round_up(tk, _LANES)
    # single q-block when the padded sequence is short (vision/audio);
    # 512-row q-blocks for long encoders (Whisper's 1500)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    tq_pad1 = _round_up(tq, sub)
    tq_blk = tq_pad1 if tq_pad1 <= 512 else 512
    tqp = _round_up(tq, tq_blk)
    nq = tqp // tq_blk

    def fold(t, t_len, t_pad):
        t = t.reshape(g, t_len, hd)
        return jnp.pad(t, ((0, 0), (0, t_pad - t_len), (0, hdp - hd)))

    qf, kf, vf = fold(q, tq, tqp), fold(k, tk, tkp), fold(v, tk, tkp)

    # units per grid step: largest divisor of g whose working set (q/k/v tiles
    # + the fp32 logits block per unit, double-buffered by the pipeline) stays
    # within a conservative VMEM budget. ViT-H b128 (g=2048, Tk 384) lands at
    # 8-16; Whisper's long-Tk encoder (logits 512×1536 fp32 per unit) at 1-2.
    itemsize = qf.dtype.itemsize
    per_unit = (
        tq_blk * hdp * 2 * itemsize  # q in + compute-dtype out
        + 2 * tkp * hdp * itemsize  # k + v
        + tq_blk * tkp * 4  # logits scratch
    )
    budget = 8 * 1024 * 1024
    g_blk = max(1, min(16, budget // per_unit))
    while g % g_blk:
        g_blk -= 1

    out = pl.pallas_call(
        functools.partial(
            _mha_kernel, scale=scale, tk_valid=tk,
            cls_split=cls_split, fast_exp=fast_exp, defer_div=softmax_opt,
        ),
        out_shape=jax.ShapeDtypeStruct((g, tqp, hdp), q.dtype),
        grid=(g // g_blk, nq),
        in_specs=[
            pl.BlockSpec((g_blk, tq_blk, hdp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, tkp, hdp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, tkp, hdp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g_blk, tq_blk, hdp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * tqp * tkp * hdp,
            bytes_accessed=(qf.size + kf.size + vf.size + g * tqp * hdp)
            * qf.dtype.itemsize,
            transcendentals=g * tqp * tkp,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :tq, :hd].reshape(b, h, tq, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_mha(q, k, v, scale: float, interpret: bool = False, softmax_opt: bool = False):
    """Fused attention forward; differentiable (XLA-recompute backward).

    Equivalent to
        softmax(q @ k^T * scale, fp32) cast to q.dtype, @ v, fp32 accumulation
    i.e. exactly the einsum pair in models/layers.py:attention with mask=None.
    softmax_opt=False (default) keeps the legacy bit-compatible softmax;
    True enables the CLS-split / fast-exp schedule (≤1 bf16 ulp difference,
    see softmax_opt_default for the routing policy).
    """
    return _flash_mha_fwd_impl(q, k, v, scale, interpret, softmax_opt)


def _fwd(q, k, v, scale, interpret, softmax_opt):
    return _flash_mha_fwd_impl(q, k, v, scale, interpret, softmax_opt), (q, k, v)


def _bwd(scale, interpret, softmax_opt, res, grad):
    q, k, v = res
    dt = q.dtype
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits, axis=-1)
    wc = w.astype(dt)
    g32 = grad.astype(dt)
    dv = jnp.einsum("bhqk,bhqd->bhkd", wc, g32, preferred_element_type=jnp.float32)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(dt), preferred_element_type=jnp.float32)
    dlogits = (w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True)) * scale).astype(dt)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlogits, k.astype(dt), preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlogits, q.astype(dt), preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_mha.defvjp(_fwd, _bwd)


def flash_supported(tq: int, tk: int, hd: int) -> bool:
    """Static shape gate: the kernel handles what fits its VMEM budget."""
    return hd <= _LANES and tk <= _MAX_TK and tq >= 1


# ---------------------------------------------------------------------------
# Transpose-free variant: attention in the NATIVE (B, T, H, hd) layout
# ---------------------------------------------------------------------------
# The (B, H, T, hd) kernel above needs the caller to head-split q/k/v
# (reshape + transpose of three (B, T, D) tensors), fold to (B·H, T, hd),
# zero-pad hd→128 / Tk→lane multiple, and merge-transpose the output back —
# at ViT-H b128 that is four 84 MB bf16 transposes plus two padded copies of
# HBM traffic per layer that contribute zero FLOPs. This kernel instead
# ingests q/k/v exactly as the QKV projection's reshape produces them —
# (B, T, H, hd), no transpose, no fold, no explicit padding (Mosaic masks the
# partial hd tile) — and writes the output in the same layout, which the
# out-projection consumes with a free reshape. Grid is (B, H/GH); each step
# loads a (1, T, GH, hd) block per operand and loops the GH head planes.
#
# Constraint (Mosaic block-spec rule): the second-to-last block dim must be a
# multiple of 8 or equal the array dim, so GH=8 when H%8==0, GH=H for tiny
# heads (H<=8); other H fall back to the transposing kernel. GH=16 is also
# legal by that rule but crashed the remote compile helper on this
# environment — 8 is the measured-safe blocking.


def _mha_kernel_bthd(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One grid step: (1, TQ, GH, HD) q block vs (1, TK, GH, HD) k/v blocks.

    Head planes are statically unrolled; logits/softmax live only in VMEM
    (fp32), the value matmul accumulates fp32 and emits the compute dtype —
    numerically the same schedule as _mha_kernel."""
    for u in range(q_ref.shape[2]):
        q = q_ref[0, :, u, :]
        k = k_ref[0, :, u, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, u, :] = jnp.dot(
            w.astype(q.dtype), v_ref[0, :, u, :], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bthd_gh(h: int):
    if h % 8 == 0:
        return 8
    if h <= 8:
        return h
    return None


def bthd_supported(b: int, h: int, tq: int, tk: int, hd: int) -> bool:
    """Static gate for the (B, T, H, hd) kernel: a head-group's q/k/v/out
    blocks plus one fp32 logits scratch must fit the VMEM budget with the
    whole sequence resident (this kernel has no q-blocking — it targets the
    short-sequence towers: ViT 257, audio trunk 231)."""
    gh = _bthd_gh(h)
    if gh is None or hd > _LANES:
        return False
    per_step = 2 * (2 * tq + 2 * tk) * gh * _round_up(hd, _LANES) * 2 + tq * tk * 4
    return per_step <= 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_mha_bthd_fwd_impl(q, k, v, scale: float, interpret: bool = False):
    """q: (B, Tq, H, hd); k/v: (B, Tk, H, hd) — returns (B, Tq, H, hd) in
    q.dtype. No transposes; hd is zero-padded to the 128-lane width before
    the call (measured on v5e 2026-08-20: a bf16 4-D block with a NON-lane-
    multiple last dim crashes the Mosaic compiler — tpu_compile_helper exit 1
    — for every (b, tq) tried, while the same kernel at hd=128 compiles; the
    padding is exact since zero lanes add 0 to q·k and produce zero output
    columns that the final slice drops). One fused pad of each operand is
    ~⅓ of the bytes the four split/merge transposes + fold moved."""
    b, tq, h, hd = q.shape
    tk = k.shape[1]
    gh = _bthd_gh(h)
    hdp = _round_up(hd, _LANES)
    if hdp != hd:
        pad = ((0, 0), (0, 0), (0, 0), (0, hdp - hd))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = pl.pallas_call(
        functools.partial(_mha_kernel_bthd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, tq, h, hdp), q.dtype),
        grid=(b, h // gh),
        in_specs=[
            pl.BlockSpec((1, tq, gh, hdp), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, gh, hdp), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, gh, hdp), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, gh, hdp), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * hdp,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[..., :hd] if hdp != hd else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha_bthd(q, k, v, scale: float, interpret: bool = False):
    """Fused attention in the native (B, T, H, hd) layout; differentiable
    (XLA-recompute backward). Values match flash_mha on the transposed
    operands exactly — same fp32 logits/softmax, compute-dtype value matmul."""
    return _flash_mha_bthd_fwd_impl(q, k, v, scale, interpret)


def _bthd_fwd(q, k, v, scale, interpret):
    return _flash_mha_bthd_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _bthd_bwd(scale, interpret, res, grad):
    q, k, v = res
    dt = q.dtype
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits, axis=-1)
    wc = w.astype(dt)
    g = grad.astype(dt)
    dv = jnp.einsum("bhqk,bqhd->bkhd", wc, g, preferred_element_type=jnp.float32)
    dw = jnp.einsum("bqhd,bkhd->bhqk", g, v.astype(dt), preferred_element_type=jnp.float32)
    dlogits = (w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True)) * scale).astype(dt)
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, k.astype(dt), preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, q.astype(dt), preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_mha_bthd.defvjp(_bthd_fwd, _bthd_bwd)


@functools.lru_cache(maxsize=1)
def bthd_default() -> bool:
    """Route policy for the transpose-free layout: HIPPOMM_FLASH_BTHD=1
    forces on, =0 forces off. 'auto' (default) is OFF pending a healthy-window
    hardware measurement (scripts/vit_op_micro.py row 6 vs row 1) — flip this
    to backend-gated once the margin is banked."""
    flag = os.environ.get("HIPPOMM_FLASH_BTHD", "auto").lower()
    if flag in ("1", "true", "on"):
        return True
    return False


def flash_profitable(tq: int, tk: int, hd: int) -> bool:
    """Measured routing policy (v5e):

      whisper-enc (hd=64, Tk=1500): tower fwd 828 → 672 ms   (kernel wins)
      audio trunk (hd=64, Tk=231):  op-level 1.15×            (kernel wins)
      ViT-H vision (hd=80, Tk=257): op-level 32-layer chain at b128
                                    113.4 → 97.3 ms           (kernel wins)

    The hd=80 loss in the one-unit-per-step kernel (0.81× at b128) was grid
    overhead, not the 128-lane pad: at ViT-H b128 the grid was 2048 tiny
    steps and per-step cost dominated the (272, 128)×(128, 384) matmuls.
    G-blocked steps (see _mha_kernel) amortize it and the kernel now wins
    every supported shape; both paths sit near the softmax VPU floor, so the
    margin is the removed (B, H, Tq, Tk) HBM round-trip."""
    return flash_supported(tq, tk, hd)


@functools.lru_cache(maxsize=1)
def _fast_exp_enabled() -> bool:
    """HIPPOMM_FLASH_FASTEXP=1 re-enables the polynomial fast-exp inside the
    softmax_opt body. Default OFF: measured a loss at ViT-H b128 (attn_dbg
    2026-08-21 — row c 66.89 vs product 57.78; row f 53.78 vs row g 45.91
    ms/32L) — kept as a reference for hardware where transcendental exp is
    the actual floor."""
    return os.environ.get("HIPPOMM_FLASH_FASTEXP", "0").lower() in ("1", "true", "on")


@functools.lru_cache(maxsize=1)
def softmax_opt_default() -> bool:
    """Route policy for the softmax-floor optimizations (CLS-split schedule
    where Tk ≡ 1 mod 128 + deferred output division): HIPPOMM_FLASH_SOFTMAX_OPT
    =1 forces on, =0 forces off. 'auto' (default) enables on TPU ONLY:
    measured 45.91 vs 57.78 ms per 32-layer ViT-H b128 attention chain
    (scripts/attn_dbg.py row g_cls_exact vs a_product, 2026-08-21); the
    non-splittable deferred-division body measured 49.37 (row b). The
    measurement is TPU-specific — other accelerator backends keep the exact
    body unless forced (ADVICE r4 #4), and CPU keeps the exact path (no
    Mosaic lowering; hermetic tests pin numerics there)."""
    flag = os.environ.get("HIPPOMM_FLASH_SOFTMAX_OPT", "auto").lower()
    if flag in ("1", "true", "on"):
        return True
    if flag in ("0", "false", "off"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def flash_default() -> bool:
    """Route policy: HIPPOMM_FLASH_ATTN=1 forces on, =0 forces off; 'auto'
    (default) enables on real TPU backends only — CPU has no Mosaic lowering
    and the einsum path is what the hermetic tests pin numerics against."""
    flag = os.environ.get("HIPPOMM_FLASH_ATTN", "auto").lower()
    if flag in ("1", "true", "on"):
        return True
    if flag in ("0", "false", "off"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
