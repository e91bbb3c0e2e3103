"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
sharded top-k over a synthetic event store; TP/DP train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hippomm_tpu.memory.schema import ThetaEvent
from hippomm_tpu.parallel.mesh import data_sharding, make_mesh, param_shardings
from hippomm_tpu.parallel.sharded_store import ShardedFeatureStore


def make_events(rng, n_events=20, rows_per_event=50):
    events = []
    for i in range(n_events):
        feats = rng.normal(size=(rows_per_event, 1024)).astype(np.float32)
        events.append(
            ThetaEvent(
                video_id=f"v{i}",
                features={"vision": feats},
                feature_times={"vision": list(np.arange(rows_per_event, dtype=float))},
                start_time=0.0,
                end_time=float(rows_per_event),
            )
        )
    return events


def test_make_mesh_shapes():
    m = make_mesh(8, model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_sharded_topk_exact(rng):
    """Sharded top-k == dense numpy top-k (1k-row store, 8-way shard)."""
    mesh = make_mesh(8, model_parallel=1)
    events = make_events(rng)  # 1000 rows
    store = ShardedFeatureStore.build(events, mesh, "vision")
    assert len(store) == 1000

    q = rng.normal(size=1024).astype(np.float32)
    hits = store.search(q, k=7)
    assert len(hits) == 7

    # dense oracle
    feats = np.concatenate([e.features["vision"] for e in events])
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sims = fn @ (q / np.linalg.norm(q))
    order = np.argsort(-sims)[:7]
    np.testing.assert_allclose(
        [h[3] for h in hits], sims[order], rtol=1e-5, atol=1e-5
    )
    # owners map back correctly
    assert [h[0] for h in hits] == [events[i // 50].event_id for i in order]


def test_sharded_topk_with_padding(rng):
    """Row count not divisible by shard count still returns exact results."""
    mesh = make_mesh(8, model_parallel=1)
    events = make_events(rng, n_events=3, rows_per_event=7)  # 21 rows, pad to 24
    store = ShardedFeatureStore.build(events, mesh, "vision")
    q = np.asarray(events[1].features["vision"][3])
    hits = store.search(q, k=3)
    assert hits[0][0] == events[1].event_id
    assert hits[0][3] > 0.999


def test_sharded_index_matches_single_device(rng):
    """ShardedFeatureIndex (the product QA backend on multi-chip engines)
    returns exactly the single-device FeatureSearchIndex results — same
    SearchHits, same per-event caps, same widening."""
    from hippomm_tpu.parallel.sharded_store import ShardedFeatureIndex
    from hippomm_tpu.retrieval.search import FeatureSearchIndex

    mesh = make_mesh(8, model_parallel=1)
    events = make_events(rng, n_events=7, rows_per_event=13)  # 91 rows, padded
    single = FeatureSearchIndex.build(events, "vision")
    sharded = ShardedFeatureIndex.build(events, "vision", mesh)
    assert len(sharded) == len(single) == 91

    for trial in range(3):
        q = rng.normal(size=1024).astype(np.float32)
        hs = single.search(q, top_k_per_event=3, global_top_k=5)
        hd = sharded.search(q, top_k_per_event=3, global_top_k=5)
        assert [(h.event_id, h.index_in_event) for h in hd] == [
            (h.event_id, h.index_in_event) for h in hs
        ]
        np.testing.assert_allclose(
            [h.similarity for h in hd], [h.similarity for h in hs], rtol=1e-4, atol=1e-5
        )

    queries = rng.normal(size=(4, 1024)).astype(np.float32)
    bs = single.search_batch(queries, top_k_per_event=3, global_top_k=5)
    bd = sharded.search_batch(queries, top_k_per_event=3, global_top_k=5)
    for hs_q, hd_q in zip(bs, bd):
        assert [(h.event_id, h.index_in_event) for h in hd_q] == [
            (h.event_id, h.index_in_event) for h in hs_q
        ]


def test_sharded_index_k_wider_than_shard(rng):
    """k larger than a shard's row count stays exact (local top-k degenerates
    to the whole shard)."""
    from hippomm_tpu.parallel.sharded_store import ShardedFeatureIndex
    from hippomm_tpu.retrieval.search import FeatureSearchIndex

    mesh = make_mesh(8, model_parallel=1)
    events = make_events(rng, n_events=2, rows_per_event=12)  # 3 rows/shard
    single = FeatureSearchIndex.build(events, "vision")
    sharded = ShardedFeatureIndex.build(events, "vision", mesh)
    q = rng.normal(size=1024).astype(np.float32)
    hs = single.search(q, top_k_per_event=10, global_top_k=10)
    hd = sharded.search(q, top_k_per_event=10, global_top_k=10)
    assert [(h.event_id, h.index_in_event) for h in hd] == [
        (h.event_id, h.index_in_event) for h in hs
    ]


def test_qa_product_path_uses_sharded_index(tmp_path, rng):
    """A multi-chip engine's QARecallSystem builds the SHARDED index from the
    product query path (VERDICT r1 missing #2: sharded retrieval must be
    reachable from ask_question, not just the dryrun)."""
    from hippomm_tpu.config import Config
    from hippomm_tpu.memory.engine import HippocampalMemory
    from hippomm_tpu.parallel.sharded_store import ShardedFeatureIndex
    from hippomm_tpu.retrieval.qa import QARecallSystem

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path)
    mem = HippocampalMemory(config=cfg)
    assert mem.mesh is not None and mem.mesh.devices.size == 8
    mem.long_term_store = make_events(rng, n_events=4, rows_per_event=9)
    qa = QARecallSystem(mem, cfg)
    assert isinstance(qa._index("vision"), ShardedFeatureIndex)
    r = qa.answer_question("What is shown at the start of the video?")
    assert r.answer


def test_param_shardings_tp_rules(rng):
    from hippomm_tpu.models.imagebind.model import init_imagebind, tiny_config

    mesh = make_mesh(8, model_parallel=2)
    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(0), cfg)
    shardings = param_shardings(params, mesh)
    blk = shardings["vision"]["blocks"]
    # stacked fc1 weight (depth, hidden, width): hidden sharded over model
    assert blk["mlp"]["fc1"]["weight"].spec == jax.sharding.PartitionSpec(None, "model", None)
    assert blk["mlp"]["fc2"]["weight"].spec == jax.sharding.PartitionSpec(None, None, "model")
    assert blk["attn"]["in_proj"]["weight"].spec == jax.sharding.PartitionSpec(None, "model", None)
    # norms replicated
    assert blk["norm_1"]["weight"].spec == jax.sharding.PartitionSpec(None, None)


def test_tp_forward_matches_single_device(rng):
    """vision_forward under a dp×tp mesh == single-device forward."""
    from hippomm_tpu.models.imagebind.model import init_imagebind, tiny_config, vision_forward

    cfg = tiny_config()
    params = init_imagebind(jax.random.PRNGKey(0), cfg)
    img = rng.normal(size=(4, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    want = np.asarray(vision_forward(params, jnp.asarray(img), cfg, dtype=jnp.float32))

    mesh = make_mesh(8, model_parallel=2)
    sh_params = jax.device_put(params, param_shardings(params, mesh))
    sh_img = jax.device_put(img, data_sharding(mesh, 4))
    got = np.asarray(vision_forward(sh_params, sh_img, cfg, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_train_step_runs_and_descends(rng):
    """Contrastive train step on the dp×tp mesh: loss decreases over steps."""
    import optax

    from hippomm_tpu.models.imagebind.model import tiny_config
    from hippomm_tpu.train.contrastive import init_train_state, make_train_step

    cfg = tiny_config()
    mesh = make_mesh(8, model_parallel=2)
    params, opt_state, tx, shardings = init_train_state(
        jax.random.PRNGKey(0), cfg, mesh, learning_rate=1e-3
    )
    step = make_train_step(cfg, mesh, tx, shardings, dtype=jnp.float32)

    images = rng.normal(size=(8, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(8, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1  # EOS

    losses = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, images, tokens)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_encode_matches_single_device(mesh8):
    """Data-parallel ImageBind encode over the mesh == single-device encode."""
    import numpy as np

    from hippomm_tpu.models.foundation import ImageBind

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(16, 56, 56, 3)).astype(np.uint8)
    texts = ["a red square", "a blue circle", "tone", "speech", "cat", "dog", "sea", "sky"]

    single = ImageBind(variant="tiny", seed=3)
    sharded = ImageBind(variant="tiny", seed=3, mesh=mesh8)
    # sharded compilation re-tiles per shard: bf16-matmul-level fp noise only
    np.testing.assert_allclose(
        sharded.encode_vision(frames), single.encode_vision(frames), atol=5e-4
    )
    np.testing.assert_allclose(
        sharded.encode_text(texts), single.encode_text(texts), atol=5e-4
    )


def test_engine_auto_mesh_on_multidevice(tmp_path):
    """The engine builds a data-parallel mesh over all local devices by
    default and the pipeline still produces correct events."""
    import numpy as np

    from hippomm_tpu.config import Config
    from hippomm_tpu.media.synth import SynthSpec, generate
    from hippomm_tpu.memory.engine import HippocampalMemory

    cfg = Config()
    cfg.api.mode = "stub"
    cfg.models.imagebind_variant = "tiny"
    cfg.models.whisper_variant = "stub"
    cfg.storage.base_dir = str(tmp_path / "store")
    mem = HippocampalMemory(config=cfg)
    assert mem.mesh is not None and mem.mesh.shape["data"] == 8

    res = generate(SynthSpec(duration=24.0, fps=2.0, width=160, height=120, seed=6))
    mem.add_video("meshvid", "")
    stms = mem.process_sequence(
        "meshvid",
        frame_paths=[f"f_{i}.jpg" for i in range(len(res.frames))],
        frame_times=res.frame_times,
        frames_rgb=res.frames,
        audio_data=res.audio,
    )
    assert stms and all(
        np.isfinite(s.features["vision"]).all() for s in stms if "vision" in s.features
    )
    assert len(mem.long_term_store) == 1


def test_sharded_whisper_greedy_matches_single(mesh8):
    """Chunk-batch-sharded greedy transcription over the mesh == single-device
    (greedy decode only; beam keeps its cache-reordering local)."""
    import jax.numpy as jnp
    import numpy as np

    from hippomm_tpu.models.whisper.model import init_whisper, tiny_config
    from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber

    import jax

    cfg = tiny_config()
    params = init_whisper(jax.random.PRNGKey(1), cfg)
    single = WhisperTranscriber(params, cfg, None, jnp.float32, beam_size=1)
    sharded = WhisperTranscriber(params, cfg, None, jnp.float32, beam_size=1, mesh=mesh8)
    for tr in (single, sharded):
        tr._chunk_samples = 2 * 16000  # tiny config covers 2 s per window
    rng = np.random.default_rng(2)
    clips = [(0.1 * rng.normal(size=9 * 16000)).astype(np.float32)]  # 5 chunks
    a = single.transcribe_many(clips, max_new_tokens=6, max_chunk_batch=8)
    b = sharded.transcribe_many(clips, max_new_tokens=6, max_chunk_batch=8)
    assert [(s.start, s.end) for s in a[0]] == [(s.start, s.end) for s in b[0]]


@pytest.mark.isolated
def test_replica_mesh_matches_dp_tp(rng):
    """Multi-slice layout: a ("replica","data","model") mesh (replica = DCN
    data parallelism, params replicated across it) reproduces the dp×tp
    mesh's loss trajectory step for step — the replica axis only changes
    WHERE the gradient psum runs, not the math.

    Marked `isolated`: two 3-step collective trajectories over 8 virtual CPU
    devices — the class that has aborted a starved suite process (conftest)."""
    from hippomm_tpu.models.imagebind.model import tiny_config
    from hippomm_tpu.train.contrastive import init_train_state, make_train_step

    cfg = tiny_config()
    images = rng.normal(size=(8, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(8, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1

    def run(mesh):
        params, opt_state, tx, shardings = init_train_state(
            jax.random.PRNGKey(0), cfg, mesh, learning_rate=1e-3
        )
        step = make_train_step(cfg, mesh, tx, shardings, dtype=jnp.float32)
        out = []
        for _ in range(3):
            params, opt_state, metrics = step(params, opt_state, images, tokens)
            out.append(float(metrics["loss"]))
        return out

    mesh_r = make_mesh(8, model_parallel=2, dcn_replicas=2)
    assert mesh_r.shape == {"replica": 2, "data": 2, "model": 2}
    losses_r = run(mesh_r)
    losses = run(make_mesh(8, model_parallel=2))
    np.testing.assert_allclose(losses_r, losses, rtol=1e-5)


def test_engine_replica_mesh_end_to_end(tmp_path):
    """mesh_replicas=2 (multi-slice layout) through the PRODUCT path: the
    engine builds a ("replica","data","model") mesh, ingest produces the same
    event features as a single-device engine, and the QA index still selects
    the sharded backend and finds the right rows."""
    import numpy as np

    from hippomm_tpu.config import Config
    from hippomm_tpu.media.synth import SynthSpec, generate
    from hippomm_tpu.memory.engine import HippocampalMemory
    from hippomm_tpu.retrieval.qa import QARecallSystem

    def build(tag, replicas, model):
        cfg = Config()
        cfg.api.mode = "stub"
        cfg.models.imagebind_variant = "tiny"
        cfg.models.whisper_variant = "stub"
        cfg.system.mesh_replicas = replicas
        cfg.system.mesh_model = model
        cfg.storage.base_dir = str(tmp_path / f"store_{tag}")
        mem = HippocampalMemory(config=cfg)
        res = generate(SynthSpec(duration=24.0, fps=2.0, width=160, height=120, seed=6))
        mem.add_video("vid", "")
        mem.process_sequence(
            "vid",
            frame_paths=[f"f_{i}.jpg" for i in range(len(res.frames))],
            frame_times=res.frame_times,
            frames_rgb=res.frames,
            audio_data=res.audio,
        )
        return cfg, mem

    cfg_r, mem_r = build("rep", replicas=2, model=2)
    assert dict(mem_r.mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    cfg_1, mem_1 = build("one", replicas=1, model=1)

    ev_r = mem_r.long_term_store[0]
    ev_1 = mem_1.long_term_store[0]
    np.testing.assert_allclose(
        ev_r.features["vision"], ev_1.features["vision"], atol=5e-4
    )

    qa = QARecallSystem(mem_r, cfg_r)
    idx = qa._index("vision")
    assert type(idx).__name__ == "ShardedFeatureIndex"
    q = np.asarray(ev_r.features["vision"][0], np.float32)
    hits = idx.search(q, top_k_per_event=3, global_top_k=3)
    assert hits and hits[0].similarity > 0.999


def test_replica_mesh_indivisible_batches_run_replicated():
    """Divisibility gates must use data x replica, not data alone: a batch
    divisible by the data axis but NOT by the full (replica, data) split has
    to fall back to replicated placement instead of device_put raising on a
    non-divisible partition (review finding r2)."""
    import numpy as np

    from hippomm_tpu.models.foundation import ImageBind

    mesh = make_mesh(8, model_parallel=2, dcn_replicas=2)  # data axis = 2
    ib = ImageBind(variant="tiny", seed=3, mesh=mesh)
    single = ImageBind(variant="tiny", seed=3)

    # 2 texts: 2 % data(2) == 0 but 2 % (replica*data)(4) != 0
    texts = ["a red square", "a blue circle"]
    np.testing.assert_allclose(
        ib.encode_text(texts), single.encode_text(texts), atol=5e-4
    )

    # whisper chunk sharding takes the same gate
    from hippomm_tpu.models.whisper.model import get_config, init_whisper
    from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber

    cfg = get_config("tiny")
    params = init_whisper(jax.random.PRNGKey(1), cfg)
    tr = WhisperTranscriber(params, cfg, None, jnp.float32, beam_size=1, mesh=mesh)
    tr._chunk_samples = 2 * 16000
    segs = tr.transcribe_many(
        [np.zeros(4 * 16000, np.float32)], max_new_tokens=4, max_chunk_batch=2
    )
    assert len(segs) == 1


def test_zero1_trajectory_matches_replicated_opt_state(rng):
    """ZeRO-1 (optimizer moments sharded over "data") is a PLACEMENT change,
    not a math change: 3 train steps produce the same params as the
    replicated-opt-state step, and the AdamW moments are actually sharded
    (per-device moment bytes shrink by the data-axis size)."""
    from hippomm_tpu.models.imagebind.model import tiny_config
    from hippomm_tpu.parallel.mesh import zero1_opt_shardings
    from hippomm_tpu.train.contrastive import init_train_state, make_train_step

    cfg = tiny_config()
    mesh = make_mesh(8, model_parallel=2)
    images = rng.normal(size=(8, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size - 2, size=(8, cfg.context_length)).astype(np.int32)
    tokens[:, -1] = cfg.vocab_size - 1  # EOS

    def run(zero1, n_steps):
        params, opt_state, tx, shardings = init_train_state(
            jax.random.PRNGKey(0), cfg, mesh, learning_rate=1e-3, zero1=zero1
        )
        opt_sh = zero1_opt_shardings(opt_state, params, mesh) if zero1 else None
        step = make_train_step(cfg, mesh, tx, shardings, dtype=jnp.float32,
                               opt_shardings=opt_sh)
        losses = []
        for _ in range(n_steps):
            params, opt_state, metrics = step(params, opt_state, images, tokens)
            losses.append(float(metrics["loss"]))
        return params, opt_state, losses

    # one step: the only divergence is fp32 reduction order (reduce_scatter
    # vs full psum), so params agree tightly
    params_ref, _, _ = run(zero1=False, n_steps=1)
    params_z1, _, _ = run(zero1=True, n_steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                    jax.tree_util.tree_leaves(params_z1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)

    # three steps: AdamW's mu/sqrt(nu) amplifies reduction-order noise on
    # near-zero moments, so per-element equality loosens — the LOSS trajectory
    # must stay equivalent and descending
    _, _, losses_ref = run(zero1=False, n_steps=3)
    _, opt_z1, losses_z1 = run(zero1=True, n_steps=3)
    np.testing.assert_allclose(losses_z1, losses_ref, rtol=1e-3)
    assert losses_z1[-1] < losses_z1[0]

    # the moments are REALLY sharded: find a large mu leaf and check its spec
    # names "data" and its addressable shard is data_size x smaller
    data_size = mesh.shape["data"]
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(opt_z1):
        if not hasattr(leaf, "sharding") or leaf.ndim == 0 or leaf.size < 64:
            continue
        spec = leaf.sharding.spec
        if any(ax == "data" for ax in spec):
            shard_rows = leaf.addressable_shards[0].data.shape
            assert np.prod(shard_rows) * data_size <= leaf.size * 2  # model axis may also split
            sharded += 1
    assert sharded >= 4, f"only {sharded} moment leaves sharded over data"


def test_vision_stream_on_mesh_matches_encode(mesh8, rng):
    """The stream's worker-thread dispatch (host resize -> sharded device_put
    -> jitted tower) must equal a one-shot encode_vision on the same mesh."""
    from hippomm_tpu.models.foundation import ImageBind

    ib = ImageBind(variant="tiny", mesh=mesh8)
    s = ib.cfg.image_size
    frames = rng.integers(0, 256, size=(40, s * 2, s * 3, 3)).astype(np.uint8)

    stream = ib.vision_stream()
    stream.feed(frames[:7])
    stream.feed(frames[7:25])
    stream.feed(frames[25:])
    got = stream.result()
    want = ib.encode_vision(frames)
    assert got.shape == want.shape == (40, 1024)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
