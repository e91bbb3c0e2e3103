"""Model/optimizer checkpointing via orbax (sharding-aware).

Complements the memory-store checkpoints (memory/store.py — STM/event JSON,
reference-compatible): this handles the big param pytrees (fine-tuned towers),
restoring directly into the current mesh's shardings.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None, shardings: Optional[Any] = None) -> Any:
    """Restore; `like` provides the target structure, `shardings` the placement."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    target = jax.tree.map(
        lambda x, s=None: jax.ShapeDtypeStruct(x.shape, x.dtype), like
    )
    if shardings is not None:
        target = jax.tree.map(
            lambda sds, sh: jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=sh),
            target,
            shardings,
        )
    return ckptr.restore(path, target)
