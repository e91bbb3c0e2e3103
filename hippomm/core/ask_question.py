"""Reference-compatible entry point: python -m hippomm.core.ask_question
(reference: hippomm/core/ask_question.py:76-99)."""
import sys

from hippomm_tpu.core.ask_question import ask_question, list_events, load_event, main  # noqa: F401

if __name__ == "__main__":
    sys.exit(main())
