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
from hippomm_tpu.utils.device import fetch

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
    # int32 mask: bool (u8-on-the-wire) device->host reads stall for SECONDS on
    # the tunneled TPU (measured 8 s per sub-4MB u8/bool fetch vs 26 ms as i32)
    return saves.astype(jnp.int32), ref, cum, tlast, has_ref


class KeyframeScanner:
    """Streaming form of the greedy walk: feed fixed-size candidate blocks as
    they decode; each feed dispatches ONE async device scan and returns a
    device handle for that block's save mask. The extraction loop decodes
    block i+1 on host WHILE the device scans block i — materialize the handle
    (np.asarray) only after the next block is in flight.

    Carry (last-saved gray, cumulative diff, last-save time) chains on device
    between blocks; nothing syncs until a mask is materialized.
    """

    def __init__(
        self,
        h: int,
        w: int,
        max_diff_threshold: float = 0.3,
        min_interval_s: float = 1.0,
        block: int = BLOCK,
    ):
        self.block = block
        self._ref = jnp.zeros((h, w), jnp.float32)
        self._cum = jnp.float32(0.0)
        self._tlast = jnp.float32(-1e9)
        self._has_ref = jnp.asarray(False)
        self._thr = jnp.float32(max_diff_threshold)
        self._gap = jnp.float32(min_interval_s)

    def feed(self, grays: np.ndarray, times) -> jax.Array:
        """Score ≤block candidates; returns the (m,) save mask as a DEVICE
        array (async — do not materialize until the next block is fed)."""
        m = len(grays)
        t = np.asarray(times, np.float32)
        if m < self.block:
            grays = np.concatenate([grays, np.repeat(grays[-1:], self.block - m, axis=0)])
            t = np.concatenate([t, np.repeat(t[-1:], self.block - m)])
        valid = np.arange(self.block) < m
        saves, self._ref, self._cum, self._tlast, self._has_ref = _select_block(
            jnp.asarray(grays), jnp.asarray(t), jnp.asarray(valid),
            self._ref, self._cum, self._tlast, self._has_ref, self._thr, self._gap,
        )
        return saves[:m]


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
    scanner = KeyframeScanner(h, w, max_diff_threshold, min_interval_s, block)
    handles = [
        scanner.feed(grays[b0 : min(n, b0 + block)], t_arr[b0 : min(n, b0 + block)])
        for b0 in range(0, n, block)
    ]
    mask = np.concatenate([fetch(s) for s in handles])
    return [int(i) for i in np.nonzero(mask)[0]]
