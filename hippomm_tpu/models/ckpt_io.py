"""Checkpoint loading shared by the ImageBind and Whisper converters.

Handles the two on-disk formats real checkpoints ship in: torch pickle
(`.pth` / `pytorch_model.bin`) and safetensors (`model.safetensors` — what
current HF snapshots ship EXCLUSIVELY since the safetensors migration; a
loader that only speaks torch.load silently degrades those to random/stub
weights).
"""

from __future__ import annotations

from typing import Dict


def load_state_dict(path: str) -> Dict:
    """Checkpoint file -> flat {name: array-like} state_dict."""
    if path.endswith(".safetensors"):
        from safetensors import numpy as st_numpy

        return dict(st_numpy.load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
