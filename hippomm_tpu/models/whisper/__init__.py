from hippomm_tpu.models.whisper.model import (  # noqa: F401
    WhisperConfig,
    encoder_forward,
    greedy_decode,
    init_whisper,
)
from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber  # noqa: F401
