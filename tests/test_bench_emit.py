"""bench.py record-emission contract (VERDICT r2 Missing #1 / Weak #8).

The driver recovers the result line from a bounded (~2000 char) tail of
stdout; round 2's line outgrew it and the round's headline number was
unrecoverable. _emit must (a) print one JSON line that stays comfortably
under that window for ANY record, (b) persist the full record to
BENCH_DETAIL.json, and (c) write BENCH_LOCAL.json atomically on every
successful (value > 0) run so the outage fallback's "last successful run"
label is actually true.
"""

import importlib.util
import io
import json
import os
import shutil
from contextlib import redirect_stdout

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def bench_in_tmp(tmp_path):
    """Import a copy of bench.py rooted in tmp so _emit writes there."""
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    spec = importlib.util.spec_from_file_location("bench_tmp", tmp_path / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, tmp_path


def _emit_line(mod, record):
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod._emit(record)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    return lines[0]


def _bulky_record(value=61.5):
    return {
        "metric": "ingest_throughput_2x10min_vlog_mp4",
        "value": value,
        "unit": "video-hours/hour/chip (x realtime)",
        "vs_baseline": round(value / 50.0, 4),
        "extra": {
            "platform": "tpu",
            "device_kind": "tpu v5 lite",
            "host_cores": 1,
            "host_calib_s": 1.07,
            "workload": "w" * 400,  # prose that sank the r02 line
            "ingest_runs_x": [61.5, 60.2, 63.8],
            "run_stage_s": [{f"stage_{i}": 1.0 for i in range(16)}] * 3,
            "stage_timers": {
                f"t{i}": {"total_s": 1.0, "count": 9, "mean_s": 0.1}
                for i in range(20)
            },
            "recall_e2e_ms": 141.15,
            "detailed_recall_p50_ms": 3.26,
            "vision_tower": {
                "batch": 32, "encode_ms": 153.4, "tflops_per_s": 69.8,
                "mfu_vision": 0.3543,
                "b128": {"encode_ms": 470.0, "tflops_per_s": 91.0,
                         "mfu_vision": 0.4665},
            },
            "topk_200k": {"xla_ms": 1.104, "pallas_ms": 4.166, "rows": 200000},
            "qa_accuracy_ci": {
                "qa_accuracy": 0.95, "n_questions": 60, "ci95": [0.86, 0.98],
                "accuracy_by_type": {"video": 1.0, "audio": 0.9},
                "results_blob": "x" * 3000,
            },
        },
    }


def test_emit_line_is_compact_and_parseable(bench_in_tmp):
    mod, tmp = bench_in_tmp
    line = _emit_line(mod, _bulky_record())
    assert len(line) < 1800, len(line)
    rec = json.loads(line)
    assert rec["value"] == 61.5
    # headline extras survive the compaction
    e = rec["extra"]
    assert e["recall_e2e_ms"] == 141.15
    assert e["mfu_vision_b32"] == 0.3543
    assert e["mfu_vision_b128"] == 0.4665
    assert e["topk_xla_ms"] == 1.104
    assert e["qa_accuracy"] == 0.95 and e["qa_n"] == 60
    assert e["detail"] == "BENCH_DETAIL.json"
    # bulk went to the detail file, unabridged
    detail = json.load(open(tmp / "BENCH_DETAIL.json"))
    assert detail["extra"]["stage_timers"]["t19"]["count"] == 9
    assert detail["extra"]["workload"] == "w" * 400


def test_emit_writes_local_on_success_only(bench_in_tmp):
    mod, tmp = bench_in_tmp
    _emit_line(mod, _bulky_record(value=55.0))
    local = json.load(open(tmp / "BENCH_LOCAL.json"))
    assert local["value"] == 55.0
    # an outage (value 0) must NOT clobber the last successful record
    _emit_line(mod, {
        "metric": "ingest_throughput_2x10min_vlog_mp4",
        "value": 0.0, "unit": "u", "vs_baseline": 0.0,
        "extra": {"error": "bench watchdog fired"},
    })
    assert json.load(open(tmp / "BENCH_LOCAL.json"))["value"] == 55.0
    # but the detail file always reflects the latest run
    assert json.load(open(tmp / "BENCH_DETAIL.json"))["value"] == 0.0


def test_emit_hard_cap_fallback(bench_in_tmp):
    """Even a pathological record (huge unanticipated extras) stays under the
    window: the fallback keeps only the whitelisted keys."""
    mod, _ = bench_in_tmp
    rec = _bulky_record()
    rec["extra"]["surprise"] = ["x" * 100] * 50  # 5KB of unexpected extras
    line = _emit_line(mod, rec)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["value"] == 61.5
    assert parsed["extra"]["detail"] == "BENCH_DETAIL.json"


def test_degraded_run_does_not_clobber_clean_local(bench_in_tmp):
    """BENCH_LOCAL.json is the LAST KNOWN GOOD: a successful run labeled
    env=degraded-transport must not overwrite a clean-link measurement
    (2026-08-19: a wedging tunnel produced a 'successful' 23x that clobbered
    the 63.5x fallback label) — but it DOES write when no clean prior exists,
    and a clean run always overwrites."""
    mod, tmp = bench_in_tmp
    clean = _bulky_record(63.5)
    _emit_line(mod, clean)
    local = tmp / "BENCH_LOCAL.json"
    assert json.loads(local.read_text())["value"] == 63.5

    degraded = _bulky_record(23.2)
    degraded["extra"]["env"] = "degraded-transport"
    _emit_line(mod, degraded)
    assert json.loads(local.read_text())["value"] == 63.5  # preserved

    clean2 = _bulky_record(70.1)
    _emit_line(mod, clean2)
    assert json.loads(local.read_text())["value"] == 70.1  # clean overwrites

    local.unlink()
    _emit_line(mod, degraded)  # no prior at all -> degraded still writes
    assert json.loads(local.read_text())["value"] == 23.2


def test_transport_stats_tally():
    """Wedge retries, slow fetches AND slow uploads land in
    utils.device.transport_stats so bench can label records made through a
    sick link (r03's stall was in uploads, which the tally then missed)."""
    from hippomm_tpu.utils import device as dev

    zero = {"wedges": 0, "stall_s": 0.0, "upload_stalls": 0, "upload_stall_s": 0.0}
    dev.reset_transport_stats()
    assert dev.transport_stats() == zero
    dev._STATS["wedges"] += 2
    dev._STATS["stall_s"] += 3.5
    dev._STATS["upload_stalls"] += 1
    dev._STATS["upload_stall_s"] += 7.25
    s = dev.transport_stats()
    assert s["wedges"] == 2 and s["stall_s"] == 3.5
    assert s["upload_stalls"] == 1 and s["upload_stall_s"] == 7.25
    s["wedges"] = 99  # the returned dict is a copy
    assert dev.transport_stats()["wedges"] == 2
    dev.reset_transport_stats()
    assert dev.transport_stats() == zero


def test_timed_put_counts_slow_uploads(monkeypatch):
    """timed_put tallies uploads that block the caller (the r03 failure mode:
    device_put stalling seconds per block, invisible to the read-side tally)."""
    import numpy as np

    from hippomm_tpu.utils import device as dev

    dev.reset_transport_stats()
    _, dt = dev.timed_put(np.zeros((4, 4), np.float32))
    assert dt >= 0.0 and dev.transport_stats()["upload_stalls"] == 0

    # any put now counts as a stall: proves the tally path, clock-independent
    monkeypatch.setattr(dev, "_UPLOAD_SLOW_S", -1.0)
    _, _ = dev.timed_put(np.zeros(3, np.float32))
    s = dev.transport_stats()
    assert s["upload_stalls"] == 1 and s["upload_stall_s"] > 0.0
    dev.reset_transport_stats()


def test_final_record_assembly_carries_health(bench_in_tmp):
    """THE production assembly path (_final_record, called by main's success
    path) must carry env / transport_per_run / host_calib_per_run /
    headline_policy from the run loop — round 3 dropped them and the driver's
    degraded 23.1x landed unlabeled (VERDICT r3 Weak #1)."""
    mod, tmp = bench_in_tmp
    partial_extra = {
        "ingest_runs_x": [11.8, 23.1, 23.4],
        "headline_runs_completed": 3,
        "transport_per_run": [
            {"wedges": 0, "stall_s": 12.4, "upload_stalls": 6, "upload_stall_s": 30.1}
        ] * 3,
        "host_calib_per_run": [0.117, 0.31, 0.29, 0.3],
        "headline_policy": "median_best3_of_3",
        "env": "degraded-transport+degraded-host",
    }
    rec = mod._final_record(23.127, partial_extra, sections={
        "platform": "tpu", "device_kind": "tpu v5 lite",
        "ingest_runs_x": [11.8, 23.1, 23.4],
        "stage_timers": {}, "run_stage_s": [],
    })
    e = rec["extra"]
    assert e["env"] == "degraded-transport+degraded-host"
    assert e["transport_per_run"][0]["upload_stall_s"] == 30.1
    assert e["host_calib_per_run"] == [0.117, 0.31, 0.29, 0.3]
    assert e["headline_policy"] == "median_best3_of_3"

    # and through _emit: a clean prior BENCH_LOCAL survives the labeled record
    clean = _bulky_record(63.5)
    _emit_line(mod, clean)
    line = _emit_line(mod, rec)
    assert json.loads((tmp / "BENCH_LOCAL.json").read_text())["value"] == 63.5
    # the printed compact line itself carries the label
    assert json.loads(line)["extra"]["env"] == "degraded-transport+degraded-host"
    # the detail record carries the full evidence
    detail = json.load(open(tmp / "BENCH_DETAIL.json"))
    assert detail["extra"]["transport_per_run"][0]["upload_stalls"] == 6


def test_stall_aware_extra_retries_contaminated_reading(bench_in_tmp):
    """An extra whose reading the transport tally labels contaminated (wedge
    or stall seconds) re-measures once; every attempt + tally stays in the
    returned evidence and the BEST numeric attempt is the reported value
    (r4 banked record: single-30s-clip 3.3x from one slow fetch vs the same
    session's clean 24-28x)."""
    mod, _ = bench_in_tmp
    from hippomm_tpu.utils import device as dev

    calls = {"n": 0}

    def measure():
        calls["n"] += 1
        if calls["n"] == 1:  # first reading lands mid-wedge
            dev._STATS["wedges"] += 1
            dev._STATS["stall_s"] += 9.0
            return 3.3
        return 24.6

    best, attempts, tallies = mod._stall_aware_extra(measure, lambda: True)
    assert best == 24.6 and attempts == [3.3, 24.6]
    assert tallies[0]["wedges"] == 1 and tallies[1]["wedges"] == 0

    # clean first reading: single attempt, no retry spend
    calls["n"] = 9  # any non-1 value -> clean path
    best, attempts, _ = mod._stall_aware_extra(measure, lambda: True)
    assert best == 24.6 and len(attempts) == 1

    # a crash records the error string and stops (no retry loop on a
    # deterministic failure)
    def boom():
        raise RuntimeError("decode failed")

    best, attempts, tallies = mod._stall_aware_extra(boom, lambda: True)
    assert isinstance(best, str) and "decode failed" in best
    assert len(attempts) == 1 and len(tallies) == 1

    # out of budget: nothing runs
    best, attempts, tallies = mod._stall_aware_extra(measure, lambda: False)
    assert best is None and attempts == [] and tallies == []


def test_stall_aware_extra_prefers_clean_over_warm_retry(bench_in_tmp):
    """ADVICE r4 #1: when the FIRST attempt is clean, a warmer retry never
    happens; when the first is contaminated and the retry is clean, the clean
    retry is reported; when EVERY attempt is contaminated, fall back to max
    (least transport-damaged of a bad set)."""
    mod, _ = bench_in_tmp
    from hippomm_tpu.utils import device as dev

    calls = {"n": 0}

    def always_contaminated():
        calls["n"] += 1
        dev._STATS["wedges"] += 1
        return 10.0 + calls["n"]  # retries read warmer

    best, attempts, tallies = mod._stall_aware_extra(
        always_contaminated, lambda: True
    )
    assert attempts == [11.0, 12.0]
    assert best == 12.0  # all contaminated -> max fallback
    assert all(t["wedges"] == 1 for t in tallies)


def test_gate_headline_run_waits_out_degraded_window(bench_in_tmp):
    """VERDICT r4 Next #1: a degraded probe sleeps and re-probes instead of
    burning a measured run; a healthy probe starts the run immediately; an
    exhausted budget proceeds (the run gets env-labeled downstream)."""
    mod, _ = bench_in_tmp

    # healthy immediately: no wait
    gate = mod._gate_headline_run(
        {"s": 480.0}, calib_anchor=0.12, elapsed=lambda: 10.0,
        probe=lambda: (True, [40.0, 38.0, 41.0, 39.0]),
        calib=lambda: 0.13, sleep=lambda s: None,
    )
    assert gate["healthy"] is True and gate["waited_s"] == 0.0
    assert gate["probes"] == 1

    # degraded for two probes, then healthy: waited two naps
    seq = iter([(False, [-1.0] * 4), (False, [900.0] * 4),
                (True, [42.0, 40.0, 41.0, 43.0])])
    naps = []
    budget = {"s": 480.0}
    gate = mod._gate_headline_run(
        budget, calib_anchor=0.12, elapsed=lambda: 10.0,
        probe=lambda: next(seq), calib=lambda: 0.13,
        sleep=naps.append, nap_s=45.0,
    )
    assert gate["healthy"] is True and gate["probes"] == 3
    assert naps == [45.0, 45.0] and gate["waited_s"] == 90.0
    assert budget["s"] == 480.0 - 90.0

    # chronically degraded: budget drains, run proceeds labeled-unhealthy
    budget = {"s": 90.0}
    gate = mod._gate_headline_run(
        budget, calib_anchor=0.12, elapsed=lambda: 10.0,
        probe=lambda: (False, [-1.0] * 4), calib=lambda: 0.13,
        sleep=lambda s: None, nap_s=45.0,
    )
    assert gate["healthy"] is False and budget["s"] == 0.0

    # a degraded HOST (calib over 2x anchor) gates exactly like transport
    budget = {"s": 45.0}
    gate = mod._gate_headline_run(
        budget, calib_anchor=0.12, elapsed=lambda: 10.0,
        probe=lambda: (True, [40.0] * 4), calib=lambda: 0.30,
        sleep=lambda s: None, nap_s=45.0,
    )
    assert gate["healthy"] is False and gate["host_calib_s"] == 0.30

    # hard stop: late in the bench, never sleep even with budget left
    budget = {"s": 480.0}
    gate = mod._gate_headline_run(
        budget, calib_anchor=0.12, elapsed=lambda: 1200.0,
        probe=lambda: (False, [-1.0] * 4), calib=lambda: 0.13,
        sleep=lambda s: None,
    )
    assert gate["healthy"] is False and budget["s"] == 480.0


def test_emit_summarizes_probe_gate(bench_in_tmp):
    """The compact line carries probe_wait_s + probe_degraded_starts; the full
    per-run gate list lives only in BENCH_DETAIL.json."""
    mod, tmp = bench_in_tmp
    rec = _bulky_record()
    rec["extra"]["probe_gate"] = [
        {"healthy": True, "probe_ms": [40.0] * 4, "host_calib_s": 0.12,
         "waited_s": 0.0, "probes": 1},
        {"healthy": False, "probe_ms": [-1.0] * 4, "host_calib_s": 0.3,
         "waited_s": 135.0, "probes": 4},
        {"healthy": True, "probe_ms": [39.0] * 4, "host_calib_s": 0.12,
         "waited_s": 45.0, "probes": 2},
    ]
    line = _emit_line(mod, rec)
    e = json.loads(line)["extra"]
    assert e["probe_wait_s"] == 180.0
    assert e["probe_degraded_starts"] == 1
    assert "probe_gate" not in e
    detail = json.load(open(tmp / "BENCH_DETAIL.json"))
    assert len(detail["extra"]["probe_gate"]) == 3


def test_emit_flags_retried_extras(bench_in_tmp):
    """ADVICE r4 #1: a stall-aware extra that took >1 attempt is flagged in
    the compact record as <row>_attempts."""
    mod, _ = bench_in_tmp
    rec = _bulky_record()
    rec["extra"]["extras_transport"] = {
        "single_30s_clip": {"attempts": [3.3, 24.6], "transport": [{}, {}]},
        "audio_only": {"attempts": [23.1], "transport": [{}]},
    }
    e = json.loads(_emit_line(mod, rec))["extra"]
    assert e["single_30s_clip_attempts"] == 2
    assert "audio_only_attempts" not in e
    assert "extras_transport" not in e
