from hippomm_tpu.models.imagebind.model import (  # noqa: F401
    ImageBindConfig,
    TowerConfig,
    audio_forward,
    extract_features,
    init_imagebind,
    text_forward,
    vision_forward,
)
