"""Shape bucketing: pad data-dependent batch dims to a small set of sizes so
XLA compiles each program a bounded number of times (SURVEY.md §7 hard part 3:
"variable-length everything"). Essential both for steady-state throughput and
for remote-compile environments where every new shape costs seconds.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def bucket_size(n: int, quantum: int = 512) -> int:
    """Smallest bucket ≥ n: powers of two up to 512, then multiples of quantum."""
    for b in BUCKETS:
        if n <= b:
            return b
    return ((n + quantum - 1) // quantum) * quantum


def pad_leading(arr: np.ndarray, n: int | None = None, mode: str = "edge") -> Tuple[np.ndarray, int]:
    """Pad arr's leading axis to a bucket (or to n). Returns (padded, original_len)."""
    orig = arr.shape[0]
    target = n if n is not None else bucket_size(orig)
    if orig == target:
        return arr, orig
    pad = target - orig
    if mode == "edge" and orig > 0:
        tail = np.repeat(arr[-1:], pad, axis=0)
    else:
        tail = np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([arr, tail]), orig
