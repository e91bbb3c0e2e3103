from hippomm_tpu.memory.schema import (  # noqa: F401
    QARecallResult,
    SequenceSegment,
    ShortTermMemory,
    ThetaEvent,
)
