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
from hippomm_tpu.retrieval.search import FeatureSearchIndex


def _normalize_rows(feats: np.ndarray) -> np.ndarray:
    """Unit-normalize rows once on host (fp32) so the per-query device
    program is a bare matmul + top-k; zero rows stay zero (sim 0)."""
    return feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk(feats: jax.Array, valid: jax.Array, query: jax.Array, k: int, mesh: Mesh):
    """feats (N, D) sharded over 'data', rows PRE-NORMALIZED at build (see
    _normalize_rows — renormalizing the whole shard per query would cost an
    O(N·D) pass comparable to the matmul itself); query (D,) replicated.

    Returns (values (k,), global indices (k,)).
    """
    from jax import shard_map

    per = feats.shape[0] // mesh.shape["data"]
    # a local shard can't yield more than its own rows; when k exceeds a
    # shard, its local top-k IS the whole shard, so the gathered pool still
    # contains every true global top-k row (exactness preserved)
    k_local = min(k, per)

    def local(f, v, q):
        # f: (per, D) local shard, rows unit-norm
        qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-8)
        sims = jnp.where(v, f @ qn, -jnp.inf)  # (per,)
        lv, li = jax.lax.top_k(sims, k_local)
        shard = jax.lax.axis_index("data")
        gi = li + shard * per
        # gather every shard's candidates: (n_shards*k_local,)
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


@partial(jax.jit, static_argnames=("k", "mesh"))
def _sharded_topk_batch(feats: jax.Array, valid: jax.Array, queries: jax.Array, k: int, mesh: Mesh):
    """feats (N, D) sharded over 'data', rows PRE-NORMALIZED at build;
    queries (Q, D) replicated.

    Per shard: one (Q, D) @ (D, Nᵢ) mat-MAT (feeds the MXU) + local top-k,
    then all_gather of the (Q, n_shards·k) candidate pool over ICI and a
    replicated re-rank. Exact for k ≤ rows-per-shard (and when k exceeds a
    shard, the local top-k IS the whole shard, so still exact).

    Returns ((Q, k) values, (Q, k) global indices).
    """
    from jax import shard_map

    per = feats.shape[0] // mesh.shape["data"]
    k_local = min(k, per)

    def local(f, v, q):
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        sims = jnp.where(v[None, :], qn @ f.T, -jnp.inf)  # (Q, per)
        lv, li = jax.lax.top_k(sims, k_local)
        shard = jax.lax.axis_index("data")
        gi = li + shard * per
        av = jax.lax.all_gather(lv, "data", axis=1, tiled=True)  # (Q, n_shards*k_local)
        ai = jax.lax.all_gather(gi, "data", axis=1, tiled=True)
        fv, fp = jax.lax.top_k(av, k)
        return fv, jnp.take_along_axis(ai, fp, axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(feats, valid, queries)


class ShardedFeatureIndex(FeatureSearchIndex):
    """FeatureSearchIndex with the top-k primitive running row-sharded across
    the mesh — the PRODUCT retrieval backend for multi-chip engines.

    Same packing, sidecars, per-event cap, geometric widening, and SearchHit
    results as the single-device index (retrieval/search.py); only `_topk` /
    `_topk_batch` are replaced by the shard_map programs above. Replaces the
    reference's single-process per-event numpy matmuls
    (hippocampal_memory.py:3127-3279) at store sizes one chip can't hold.
    """

    def __init__(self, modality: str, mesh: Mesh):
        super().__init__(modality)
        self.mesh = mesh
        self._valid = None

    @classmethod
    def build(  # type: ignore[override]
        cls, events: Sequence[ThetaEvent], modality: str, mesh: Mesh
    ) -> "ShardedFeatureIndex":
        packed = FeatureSearchIndex.build(events, modality)
        self = cls(modality, mesh)
        if packed._feats is None:
            return self
        self.owners = packed.owners
        self.videos = packed.videos
        self.times = packed.times
        self.in_event_idx = packed.in_event_idx
        feats = _normalize_rows(packed._feats)
        n = feats.shape[0]
        n_data = mesh.shape["data"]
        pad = (-n) % n_data
        if pad:
            feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)])
        valid = np.arange(n + pad) < n
        self._feats = packed._feats  # host copy: len(), rare two-read fallback
        self._device = jax.device_put(feats, NamedSharding(mesh, P("data", None)))
        self._valid = jax.device_put(valid, NamedSharding(mesh, P("data")))
        return self

    def _topk(self, q, k: int):
        if hasattr(q, "is_ready"):  # device-resident query from encode_text_device
            q = jnp.asarray(q, jnp.float32).reshape(-1)
        else:
            q = np.asarray(q, np.float32).reshape(-1)
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        vals, idx = _sharded_topk(self._device, self._valid, q, k, self.mesh)
        return fetch(vals), fetch(idx).astype(np.int64)

    def _topk_batch(self, queries: np.ndarray, k: int):
        q = jax.device_put(
            np.asarray(queries, np.float32), NamedSharding(self.mesh, P(None, None))
        )
        vals, idx = _sharded_topk_batch(self._device, self._valid, q, k, self.mesh)
        return fetch(vals), fetch(idx).astype(np.int64)


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
        feats = _normalize_rows(np.stack(rows).astype(np.float32))
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
