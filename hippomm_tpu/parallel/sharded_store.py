"""Sharded ThetaEvent feature store: exact distributed top-k retrieval.

The reference's retrieval is a single-process numpy matmul per event
(hippocampal_memory.py:3127-3279). Here the (N, 1024) feature matrix shards
row-wise across the mesh's devices; a query runs as a `shard_map`:

    local normalize+matmul  →  local top-k  →  all_gather(k·D candidates)  →
    re-rank the D·k candidate pool

which is EXACT global top-k (every true top-k row is in some shard's local
top-k) while moving only k indices+scores per device over ICI instead of the
full similarity vector. Store rows are padded to the device count with -inf
guards; lookup sidecars (event ids, times) stay on host.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.utils.device import fetch
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hippomm_tpu.memory.schema import ThetaEvent


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk(feats: jax.Array, valid: jax.Array, query: jax.Array, k: int, mesh: Mesh):
    """feats (N, D) sharded over 'data'; query (D,) replicated.

    Returns (values (k,), global indices (k,)).
    """
    from jax import shard_map

    n = feats.shape[0]
    n_dev = mesh.shape["data"] * mesh.shape.get("model", 1)
    per = n // mesh.shape["data"]

    def local(f, v, q):
        # f: (per, D) local shard
        fn = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
        qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-8)
        sims = jnp.where(v, fn @ qn, -jnp.inf)  # (per,)
        lv, li = jax.lax.top_k(sims, k)
        shard = jax.lax.axis_index("data")
        gi = li + shard * per
        # gather every shard's candidates: (n_shards*k,)
        av = jax.lax.all_gather(lv, "data", tiled=True)
        ai = jax.lax.all_gather(gi, "data", tiled=True)
        fv, fi_pos = jax.lax.top_k(av, k)
        return fv, ai[fi_pos]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output is replicated; skip static VMA check
    )(feats, valid, query)


class ShardedFeatureStore:
    """Row-sharded (N, 1024) store with host sidecars, built from ThetaEvents."""

    def __init__(self, mesh: Mesh, modality: str = "vision"):
        self.mesh = mesh
        self.modality = modality
        self.n_rows = 0
        self._feats = None
        self._valid = None
        self.owners: List[str] = []
        self.videos: List[str] = []
        self.times: np.ndarray = np.zeros((0,))

    @classmethod
    def build(
        cls, events: Sequence[ThetaEvent], mesh: Mesh, modality: str = "vision"
    ) -> "ShardedFeatureStore":
        self = cls(mesh, modality)
        rows, owners, videos, times = [], [], [], []
        for ev in events:
            f = ev.features.get(modality)
            if f is None or len(f) == 0:
                continue
            t = list(ev.feature_times.get(modality, []))
            for i in range(f.shape[0]):
                rows.append(f[i])
                owners.append(ev.event_id)
                videos.append(ev.video_id)
                times.append(t[i] if i < len(t) else ev.start_time)
        if not rows:
            return self
        feats = np.stack(rows).astype(np.float32)
        n = feats.shape[0]
        n_data = mesh.shape["data"]
        pad = (-n) % n_data
        if pad:
            feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)])
        valid = np.arange(n + pad) < n

        self.n_rows = n
        self.owners, self.videos = owners, videos
        self.times = np.asarray(times)
        self._feats = jax.device_put(feats, NamedSharding(mesh, P("data", None)))
        self._valid = jax.device_put(valid, NamedSharding(mesh, P("data")))
        return self

    def __len__(self) -> int:
        return self.n_rows

    def search(self, query: np.ndarray, k: int = 5) -> List[Tuple[str, str, float, float]]:
        """query (D,) -> [(event_id, video_id, time, similarity)] exact top-k."""
        if self.n_rows == 0:
            return []
        k_eff = min(k, self.n_rows)
        q = jax.device_put(
            np.asarray(query, np.float32).reshape(-1), NamedSharding(self.mesh, P())
        )
        vals, idx = _sharded_topk(self._feats, self._valid, q, k_eff, self.mesh)
        vals, idx = fetch(vals), fetch(idx)
        out = []
        for v, i in zip(vals, idx):
            if not np.isfinite(v) or i >= self.n_rows:
                continue
            out.append((self.owners[i], self.videos[i], float(self.times[i]), float(v)))
        return out
