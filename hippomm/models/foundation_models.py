"""Reference-compatible module path (reference: hippomm/models/foundation_models.py)."""
from hippomm_tpu.models.foundation import ImageBind, QwenVL, Whisper  # noqa: F401
