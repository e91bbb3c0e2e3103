"""QA serving layer (core/serve.py): warm engine behind HTTP, hermetic.

Builds a tiny store from a synthetic clip, serves it on an ephemeral port,
and drives every endpoint — including /ingest refreshing the resident store
so later questions see the new events without a restart.
"""

import json
import os
import threading
import urllib.request

import pytest

from hippomm_tpu.config import Config
from hippomm_tpu.core.batch_process import process_video_folder
from hippomm_tpu.core.serve import QAService, make_server
from hippomm_tpu.media.synth import SynthSpec, write_synthetic_video


def _cfg(store_dir: str) -> Config:
    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = store_dir
    return cfg


def _req(port: int, path: str, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        r = urllib.request.urlopen(url, timeout=120)
    else:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"}
        )
        r = urllib.request.urlopen(req, timeout=300)
    return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    videos = tmp / "videos"
    videos.mkdir()
    write_synthetic_video(
        str(videos / "clip.mp4"),
        SynthSpec(duration=20.0, fps=2.0, width=160, height=120,
                  scene_changes=(9.0,), seed=11),
    )
    cfg = _cfg(str(tmp / "store"))
    process_video_folder(str(videos), cfg.storage.base_dir, config=cfg)

    service = QAService(cfg)
    server = make_server(service, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield service, server.server_address[1], str(tmp)
    server.shutdown()


def test_healthz_and_events(served):
    service, port, _ = served
    status, h = _req(port, "/healthz")
    assert status == 200 and h["status"] == "ok" and h["events"] == 1
    status, ev = _req(port, "/events")
    assert status == 200 and len(ev["events"]) == 1


def test_ask_and_batch(served):
    service, port, _ = served
    status, r = _req(port, "/ask", {"question": "What is shown in the video?"})
    assert status == 200 and r["answer"] and 0.0 <= r["confidence"] <= 1.0
    status, rb = _req(
        port, "/ask_batch",
        {"questions": ["What is shown?", "What sound plays?"]},
    )
    assert status == 200 and len(rb["results"]) == 2
    assert all(x["answer"] for x in rb["results"])


def test_bad_requests(served):
    service, port, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/ask", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/nope")
    assert e.value.code == 404


def test_ingest_refreshes_resident_store(served):
    service, port, tmp = served
    more = os.path.join(tmp, "more_videos")
    os.makedirs(more, exist_ok=True)
    write_synthetic_video(
        os.path.join(more, "clip2.mp4"),
        SynthSpec(duration=16.0, fps=2.0, width=160, height=120, seed=12),
    )
    status, stats = _req(port, "/ingest", {"path": more})
    assert status == 200 and stats["processed"] == 1 and stats["failed"] == 0
    status, h = _req(port, "/healthz")
    assert h["events"] == 2
    # the new event is immediately searchable through the warm QA system
    status, r = _req(port, "/ask", {"question": "What is in the newest clip?"})
    assert status == 200 and r["answer"]


def test_ingest_single_file(served):
    """/ingest also takes ONE video file (shared ingest_single_file helper,
    resident engine passed through — CLI single-file mode and server agree)."""
    service, port, tmp = served
    clip = os.path.join(tmp, "solo.mp4")
    write_synthetic_video(
        clip, SynthSpec(duration=12.0, fps=2.0, width=160, height=120, seed=13)
    )
    before = _req(port, "/healthz")[1]["events"]
    status, stats = _req(port, "/ingest", {"path": clip})
    assert status == 200 and stats["processed"] == 1 and stats["video_id"] == "solo"
    # idempotent: same file again skips
    status, stats2 = _req(port, "/ingest", {"path": clip})
    assert stats2["skipped"] == 1
    assert _req(port, "/healthz")[1]["events"] == before + 1


def test_latency_histogram_and_concurrent_asks(served):
    """Concurrent /ask requests serialize safely on the engine lock; the
    latency histogram in /healthz records them (SURVEY §7.6 observability)."""
    import concurrent.futures

    service, port, _ = served
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        futs = [
            pool.submit(_req, port, "/ask", {"question": f"What happens at {i}s?"})
            for i in range(4)
        ]
        for f in futs:
            status, r = f.result()
            assert status == 200 and r["answer"]
    status, h = _req(port, "/healthz")
    lat = h["latency_ms"]["ask"]
    assert lat["count"] >= 4 and lat["p50"] > 0 and lat["p95"] >= lat["p50"]


def test_ask_reload_sees_external_writes(served):
    """reload=true re-reads indices + events from disk: an EXTERNAL writer
    (separate engine over the same store dir) extends the corpus and the
    resident server picks it up without restart."""
    service, port, tmp = served
    ext_dir = os.path.join(tmp, "ext_videos")
    os.makedirs(ext_dir, exist_ok=True)
    write_synthetic_video(
        os.path.join(ext_dir, "external.mp4"),
        SynthSpec(duration=12.0, fps=2.0, width=160, height=120, seed=14),
    )
    cfg = _cfg(service.config.storage.base_dir)  # same store, fresh engine
    process_video_folder(ext_dir, cfg.storage.base_dir, config=cfg)
    before = len(service.memory.long_term_store)
    status, r = _req(port, "/ask", {"question": "What is new?", "reload": True})
    assert status == 200 and r["answer"]
    assert len(service.memory.long_term_store) == before + 1


def test_failed_ingest_leaves_engine_clean(served):
    """A corrupt upload 500s AND leaves no per-video residue in the
    long-lived engine (pending ASR future, cached waveform, partial STMs)."""
    service, port, tmp = served
    bad = os.path.join(tmp, "corrupt.mp4")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 4096)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/ingest", {"path": bad})
    assert e.value.code == 500
    mem = service.memory
    assert "corrupt" not in mem._asr_futures
    assert "corrupt" not in mem._full_audio
    assert "corrupt" not in mem.short_term_buffer
    assert "corrupt" not in mem.consolidated
