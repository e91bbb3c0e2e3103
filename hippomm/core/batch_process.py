"""Reference-compatible entry point: python -m hippomm.core.batch_process
(reference: hippomm/core/batch_process.py:749-826)."""
from hippomm_tpu.core.batch_process import (  # noqa: F401
    compute_frame_difference,
    extract_audio_from_video,
    extract_frames_from_video,
    main,
    process_memory_sync,
    process_single_video,
    process_video_folder,
    save_frame,
)

if __name__ == "__main__":
    main()
