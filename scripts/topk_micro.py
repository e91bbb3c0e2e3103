"""Retired-Pallas-vs-product-XLA top-k comparison (scripts-only micro).

Moved out of bench.py (VERDICT r4 Next #8): the Pallas top-k kernel was
retired from the product path in round 3 with final v5e numbers on record
(2e5×1024, k=20, read-synced: XLA over the once-normalized store ~1.1 ms,
Pallas ~4.2 ms — docs/STATE.md "Deliberately scoped out"). The kernel stays a
tested reference implementation (tests/test_pallas_topk.py); run this micro
only when re-evaluating that retirement on new hardware.

Usage: python scripts/topk_micro.py [rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    from hippomm_tpu.ops.pallas_topk import pallas_top_k_cosine
    from hippomm_tpu.ops.similarity import l2_normalize, top_k_cosine_packed_prenorm
    from hippomm_tpu.utils.device import fetch

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rng = np.random.default_rng(0)
    feats_d = jax.device_put(rng.normal(size=(rows, 1024)).astype(np.float32))
    feats_u = jax.jit(l2_normalize)(feats_d)
    qs = [jax.device_put(rng.normal(size=1024).astype(np.float32)) for _ in range(20)]

    out = {"rows": rows}
    for name, fn, first in (
        ("xla_ms", lambda qq: top_k_cosine_packed_prenorm(qq, feats_u, 20),
         lambda o: o),
        ("pallas_ms", lambda qq: pallas_top_k_cosine(qq, feats_d, 20),
         lambda o: o[0]),
    ):
        try:  # per-impl: a Mosaic lowering failure must not drop the XLA row
            fetch(first(fn(qs[0])))  # compile + warm
            t0 = time.perf_counter()
            outs = [fn(qq) for qq in qs]
            fetch(first(outs[-1]))
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(first(outs[0]))  # ready buffer: fixed read floor
            floor = time.perf_counter() - t0
            out[name] = round(max(total - floor, 0.0) / len(qs) * 1000, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)[:120]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
