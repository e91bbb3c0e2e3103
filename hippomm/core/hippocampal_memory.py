"""Reference-compatible module path (reference: hippomm/core/hippocampal_memory.py)."""
from hippomm_tpu.memory.engine import HippocampalMemory  # noqa: F401
from hippomm_tpu.memory.schema import (  # noqa: F401
    QARecallResult,
    SequenceSegment,
    ShortTermMemory,
    ThetaEvent,
)
from hippomm_tpu.memory.engine import process_frame_with_api  # noqa: F401
from hippomm_tpu.retrieval.qa import QARecallSystem  # noqa: F401
