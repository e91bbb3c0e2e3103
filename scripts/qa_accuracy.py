"""Driver bench config #5: end-to-end QA accuracy + throughput over a
ground-truthed synthetic store (reference surface: batch_process.py:749-826
ingest then ask_question.py:50-65 across a QA set).

Usage:
  python scripts/qa_accuracy.py [--duration 3600] [--videos 3] [--questions 60]
                                [--variant tiny|huge] [--cpu]

Prints one JSON line: {"qa_accuracy": ..., "ci95": [lo, hi],
"accuracy_by_type": {...}, "ingest_x": ..., "recall_p50_ms": ...}. The default
workload is a MULTI-VIDEO corpus with negative/distractor questions
(VERDICT r2 Next #4).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=3600.0,
                    help="seconds PER VIDEO")
    ap.add_argument("--questions", type=int, default=60)
    ap.add_argument("--videos", type=int, default=3)
    ap.add_argument("--variant", default="tiny", choices=("tiny", "huge"))
    ap.add_argument("--scene-seconds", type=float, default=30.0)
    ap.add_argument("--no-negatives", action="store_true")
    ap.add_argument("--caption-noise", type=float, default=0.0,
                    help="per-caption probability the oracle VLM confuses the "
                         "color with its nearest corpus neighbor (difficulty "
                         "knob — see hippomm_tpu/benchmarks/README.md)")
    ap.add_argument("--distractors", action="store_true",
                    help="last video reuses video 0's colors (near-duplicate "
                         "distractor scenes; unique tones)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hippomm_tpu.benchmarks.qa_harness import run_harness

    with tempfile.TemporaryDirectory(prefix="hippomm_qa_") as work:
        out = run_harness(
            work,
            duration=args.duration,
            scene_seconds=args.scene_seconds,
            n_questions=args.questions,
            imagebind_variant=args.variant,
            n_videos=args.videos,
            negatives=not args.no_negatives,
            caption_noise=args.caption_noise,
            distractors=args.distractors,
        )
    detail = out.pop("results")
    for r in detail:
        print(("OK " if r["correct"] else "MISS ")
              + f"[{r['type']}] " + r["q"] + " -> " + r["answer"],
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
