"""On-device greedy key-frame selection.

The reference's extraction loop (batch_process.py:170-230) is a sequential
greedy walk: SSIM each ~1 Hz candidate against the LAST-SAVED frame, keep a
cumulative diff, save on threshold. Round 1 ran the walk on host with one
batched SSIM per save — 1 + #saves device round-trips per block, which is
round-trip-bound on remote/tunneled devices.

Here the WHOLE walk is one `lax.scan` device program per fixed-size block:
carry = (reference gray frame, cumulative diff, last-save time, has-ref), one
single-pair SSIM per step (separable-conv window means — a few MFLOP), one
dispatch per 256 candidates regardless of how many frames get saved. Exactness
vs the host implementation is oracle-tested (tests/test_libav.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.ops.ssim import ssim_pairs

BLOCK = 256


@jax.jit
def _select_block(
    grays: jax.Array,  # (B, h, w) uint8 candidate frames
    times: jax.Array,  # (B,) f32 candidate times
    valid: jax.Array,  # (B,) bool — False for pad rows
    ref: jax.Array,  # (h, w) f32 — last-saved gray (zeros before first save)
    cum: jax.Array,  # () f32 cumulative diff since last save
    tlast: jax.Array,  # () f32 last save time
    has_ref: jax.Array,  # () bool — any frame saved yet
    max_diff: jax.Array,  # () f32 threshold
    min_interval: jax.Array,  # () f32 seconds between saves
):
    """One greedy block: returns (save_mask (B,), ref', cum', tlast', has_ref')."""

    def step(carry, inp):
        ref, cum, tlast, has_ref = carry
        g, t, v = inp
        gf = g.astype(jnp.float32)
        is_first = v & ~has_ref
        gate = v & has_ref & (t - tlast >= min_interval)
        diff = 1.0 - ssim_pairs(ref[None], gf[None])[0]
        cum2 = jnp.where(gate, cum + diff, cum)
        save = is_first | (gate & ((diff > max_diff) | (cum2 > max_diff)))
        ref = jnp.where(save, gf, ref)
        cum = jnp.where(save, 0.0, cum2)
        tlast = jnp.where(save, t, tlast)
        has_ref = has_ref | save
        return (ref, cum, tlast, has_ref), save

    (ref, cum, tlast, has_ref), saves = jax.lax.scan(
        step, (ref, cum, tlast, has_ref), (grays, times, valid)
    )
    return saves, ref, cum, tlast, has_ref


def select_keyframes_device(
    grays: np.ndarray,
    times,
    max_diff_threshold: float = 0.3,
    min_interval_s: float = 1.0,
    block: int = BLOCK,
) -> List[int]:
    """Greedy selection over (N, h, w) uint8 candidates — ceil(N/block) device
    dispatches total. Semantics identical to
    core.batch_process.select_keyframes_greedy (the host oracle)."""
    n = len(grays)
    if n == 0:
        return []
    h, w = grays.shape[1:]
    t_arr = np.asarray(times, np.float32)
    ref = jnp.zeros((h, w), jnp.float32)
    cum = jnp.float32(0.0)
    tlast = jnp.float32(-1e9)
    has_ref = jnp.asarray(False)
    thr = jnp.float32(max_diff_threshold)
    gap = jnp.float32(min_interval_s)
    mask = np.zeros((n,), bool)
    for b0 in range(0, n, block):
        b1 = min(n, b0 + block)
        m = b1 - b0
        g = grays[b0:b1]
        t = t_arr[b0:b1]
        if m < block:
            g = np.concatenate([g, np.repeat(g[-1:], block - m, axis=0)])
            t = np.concatenate([t, np.repeat(t[-1:], block - m)])
        valid = (np.arange(block) < m)
        saves, ref, cum, tlast, has_ref = _select_block(
            jnp.asarray(g), jnp.asarray(t), jnp.asarray(valid),
            ref, cum, tlast, has_ref, thr, gap,
        )
        mask[b0:b1] = np.asarray(saves)[:m]
    return [int(i) for i in np.nonzero(mask)[0]]
