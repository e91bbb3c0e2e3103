"""Kernel layer: fused XLA/Pallas ops for the ingest + retrieval hot paths.

Every op has a functional jit-able API. Greedy/sequential reference algorithms
(key-frame dedup, segmentation boundary search) are reformulated as scans/reductions
so they stay on device (SURVEY.md §7 layer 2).
"""

from hippomm_tpu.ops.similarity import (  # noqa: F401
    cosine_sim_matrix,
    l2_normalize,
    select_keyframes_mask,
    top_k_cosine,
)
from hippomm_tpu.ops.ssim import batched_ssim, ssim_pairs  # noqa: F401
from hippomm_tpu.ops.silence import window_rms_db, detect_silence_regions  # noqa: F401
from hippomm_tpu.ops.resize import (  # noqa: F401
    normalize_nchw,
    resize_crop_u8,
    resize_normalize,
)
