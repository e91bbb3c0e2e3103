from hippomm_tpu.retrieval.qa import QARecallSystem  # noqa: F401
