"""Whisper parity vs transformers' torch WhisperModel (random tiny config, no
network) + KV-cache decode self-consistency."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hippomm_tpu.models.whisper.convert import convert_state_dict
from hippomm_tpu.models.whisper.model import (
    decoder_forward,
    encoder_forward,
    greedy_decode,
    tiny_config,
)

ATOL = 3e-4


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    cfg = tiny_config()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.n_mels,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.heads,
        decoder_attention_heads=cfg.heads,
        encoder_ffn_dim=cfg.ffn,
        decoder_ffn_dim=cfg.ffn,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        pad_token_id=0,
        bos_token_id=cfg.bos_token,
        eos_token_id=cfg.eot_token,
        decoder_start_token_id=cfg.bos_token,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    model = WhisperModel(hf_cfg).eval()
    params = convert_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def test_encoder_parity(hf_pair):
    cfg, model, params = hf_pair
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    with torch.no_grad():
        want = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_decoder_parity(hf_pair):
    cfg, model, params = hf_pair
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int64)
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).last_hidden_state
        want = (out @ model.decoder.embed_tokens.weight.T).numpy()
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    got = np.asarray(
        decoder_forward(params, jnp.asarray(tokens.astype(np.int32)), enc, cfg, dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_greedy_decode_matches_teacher_forced(hf_pair):
    """KV-cached while_loop decode == iterative argmax over decoder_forward."""
    cfg, _, params = hf_pair
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    prompt = np.asarray([[cfg.bos_token, cfg.lang_en_token]], dtype=np.int32)
    max_len = 12

    tokens, lengths = greedy_decode(
        params, enc, jnp.asarray(prompt), cfg, max_len=max_len, dtype=jnp.float32
    )
    tokens = np.asarray(tokens)[0]

    # oracle: teacher-forced argmax chain
    cur = list(prompt[0])
    for _ in range(max_len - len(prompt[0])):
        logits = np.asarray(
            decoder_forward(
                params, jnp.asarray([cur], dtype=jnp.int32), enc, cfg, dtype=jnp.float32
            )
        )
        nxt = int(np.argmax(logits[0, -1]))
        cur.append(nxt)
        if nxt == cfg.eot_token:
            break
    want = np.asarray(cur)
    np.testing.assert_array_equal(tokens[: len(want)], want)


def test_greedy_decode_batched(hf_pair):
    cfg, _, params = hf_pair
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(3, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    prompt = np.tile([[cfg.bos_token, cfg.lang_en_token]], (3, 1)).astype(np.int32)
    tokens, lengths = greedy_decode(
        params, enc, jnp.asarray(prompt), cfg, max_len=10, dtype=jnp.float32
    )
    assert tokens.shape == (3, 10)
    assert lengths.shape == (3,)


def test_transcriber_segments(hf_pair):
    from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber

    cfg, _, params = hf_pair
    # tiny config covers 100*2 mel frames = 2 s; fake chunking still works
    tr = WhisperTranscriber(params, cfg, tokenizer=None, dtype=jnp.float32)
    tr._chunk_samples = 2 * 16000  # match tiny max_source_positions
    pcm = (0.1 * np.sin(np.arange(3 * 16000) / 10)).astype(np.float32)
    segs = tr.transcribe(pcm, max_new_tokens=6)
    assert len(segs) >= 1
    assert all(s.end > s.start for s in segs)
    assert segs[0].start == 0.0


def test_beam_decode_contains_greedy_quality(hf_pair):
    """beam=1 == greedy; beam=4 best path scores >= greedy path."""
    from hippomm_tpu.models.whisper.model import beam_decode

    cfg, _, params = hf_pair
    rng = np.random.default_rng(5)
    mel = rng.normal(size=(1, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    prompt = np.asarray([[cfg.bos_token, cfg.lang_en_token]], dtype=np.int32)
    max_len = 10

    g_tokens, g_len = greedy_decode(
        params, enc, jnp.asarray(prompt), cfg, max_len=max_len, dtype=jnp.float32
    )
    b1_tokens, b1_len, _ = beam_decode(
        params, enc, jnp.asarray(prompt), cfg, max_len=max_len, beam=1, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(g_tokens)[0], np.asarray(b1_tokens)[0])

    def seq_logprob(tok_row, length):
        """Teacher-forced log-prob of a decoded row (oracle scoring)."""
        total = 0.0
        cur = list(prompt[0])
        for pos in range(len(prompt[0]), int(length) + 1):
            logits = np.asarray(
                decoder_forward(params, jnp.asarray([cur], jnp.int32), enc, cfg, dtype=jnp.float32)
            )[0, -1]
            logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            nxt = int(tok_row[pos]) if pos < len(tok_row) else cfg.eot_token
            total += float(logp[nxt])
            cur.append(nxt)
            if nxt == cfg.eot_token:
                break
        return total

    b4_tokens, b4_len, b4_scores = beam_decode(
        params, enc, jnp.asarray(prompt), cfg, max_len=max_len, beam=4, dtype=jnp.float32
    )
    g_row, b_row = np.asarray(g_tokens)[0], np.asarray(b4_tokens)[0]
    lp_g = seq_logprob(g_row, int(np.asarray(g_len)[0]))
    lp_b = seq_logprob(b_row, int(np.asarray(b4_len)[0]))
    assert lp_b >= lp_g - 1e-4
    assert np.all(np.diff(np.asarray(b4_scores)) <= 1e-6)  # sorted best-first


def test_beam_decode_batch_rows_independent(hf_pair):
    """Batched beam over B chunks == per-chunk beam_decode, row by row."""
    from hippomm_tpu.models.whisper.model import beam_decode, beam_decode_batch

    cfg, _, params = hf_pair
    rng = np.random.default_rng(6)
    mel = rng.normal(size=(3, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    prompt = np.tile([[cfg.bos_token, cfg.lang_en_token]], (3, 1)).astype(np.int32)
    max_len = 10

    bt, bl, bs = beam_decode_batch(
        params, enc, jnp.asarray(prompt), cfg, max_len=max_len, beam=3, dtype=jnp.float32
    )
    assert bt.shape == (3, 3, max_len) and bl.shape == (3, 3)
    for i in range(3):
        st, sl, ss = beam_decode(
            params, enc[i : i + 1], jnp.asarray(prompt[:1]), cfg,
            max_len=max_len, beam=3, dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(bt[i, 0]), np.asarray(st[0]))
        assert int(bl[i, 0]) == int(sl[0])
        np.testing.assert_allclose(np.asarray(bs[i, 0]), np.asarray(ss[0]), atol=1e-5)


def test_transcribe_many_matches_serial(hf_pair):
    """Batched multi-clip transcription == per-clip transcribe."""
    from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber

    cfg, _, params = hf_pair
    tr = WhisperTranscriber(params, cfg, tokenizer=None, dtype=jnp.float32, beam_size=1)
    tr._chunk_samples = 2 * 16000  # tiny config covers 2 s per window
    rng = np.random.default_rng(7)
    clips = [
        (0.1 * rng.normal(size=3 * 16000)).astype(np.float32),  # 2 chunks
        (0.1 * rng.normal(size=16000)).astype(np.float32),  # 1 chunk
        (0.1 * rng.normal(size=5 * 16000)).astype(np.float32),  # 3 chunks
    ]
    batched = tr.transcribe_many(clips, max_new_tokens=6)
    for clip, got in zip(clips, batched):
        want = tr.transcribe_many([clip], max_new_tokens=6)[0]
        assert [(s.start, s.end, s.text) for s in got] == [
            (s.start, s.end, s.text) for s in want
        ]
    assert all(len(r) >= 1 for r in batched)


def test_beam_decode_sharded_matches_unsharded(hf_pair):
    """Beam-5 decode sharded over the mesh's data axis (shard_map, chunk-local
    beam state) == the unsharded program (VERDICT r1: the default beam config
    must not silently turn off multi-chip ASR data parallelism)."""
    import jax

    from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber
    from hippomm_tpu.parallel.mesh import make_mesh

    cfg, _, params = hf_pair
    mesh = make_mesh(8, model_parallel=1)
    rng = np.random.default_rng(8)
    clips = [(0.1 * rng.normal(size=2 * 16000)).astype(np.float32) for _ in range(3)]

    def run(mesh_arg):
        tr = WhisperTranscriber(
            params, cfg, tokenizer=None, dtype=jnp.float32, beam_size=5, mesh=mesh_arg
        )
        tr._chunk_samples = 2 * 16000
        # 3 clips x 1 chunk padded to max_chunk_batch=8, divisible by data=8
        return tr.transcribe_many(clips, max_new_tokens=6, max_chunk_batch=8)

    plain = run(None)
    sharded = run(mesh)
    for a, b in zip(plain, sharded):
        assert [(s.start, s.end, s.text) for s in a] == [
            (s.start, s.end, s.text) for s in b
        ]
