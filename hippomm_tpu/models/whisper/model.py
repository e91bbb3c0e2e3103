"""Whisper encoder/decoder in JAX with jitted KV-cached greedy decode.

Replaces the reference's faster-whisper/CTranslate2 C++ inference
(foundation_models.py:153-215) with a TPU program: log-mel frontend
(ops/mel.WhisperMel), convolutional + transformer encoder, and a decoder whose
autoregressive loop is a `lax.while_loop` over static-shape KV caches — no
dynamic shapes, early exit by mask (SURVEY.md §7 hard part #2).

Weights convert from HuggingFace `WhisperModel` state_dicts (convert.py), so
any distil/openai Whisper checkpoint drops in.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 2
    heads: int = 20
    ffn: int = 5120
    vocab_size: int = 51866
    max_source_positions: int = 1500  # 30 s of mel frames / 2
    max_target_positions: int = 448
    eps: float = 1e-5
    # special tokens (large-v3 vocab layout)
    bos_token: int = 50258  # <|startoftranscript|>
    eot_token: int = 50257  # <|endoftext|>
    lang_en_token: int = 50259
    task_transcribe_token: int = 50360
    no_timestamps_token: int = 50364


def distil_large_v3_config() -> WhisperConfig:
    return WhisperConfig()


def large_v3_config() -> WhisperConfig:
    """openai/whisper-large-v3: same encoder, full 32-layer decoder."""
    return WhisperConfig(decoder_layers=32)


def tiny_config() -> WhisperConfig:
    """Hermetic tiny variant (matches a tiny-random transformers WhisperModel)."""
    return WhisperConfig(
        n_mels=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        heads=4,
        ffn=128,
        vocab_size=256,
        max_source_positions=100,
        max_target_positions=32,
        bos_token=250,
        eot_token=251,
        lang_en_token=252,
        task_transcribe_token=253,
        no_timestamps_token=254,
    )


def get_config(variant: str) -> WhisperConfig:
    if variant == "distil-large-v3":
        return distil_large_v3_config()
    if variant == "large-v3":
        return large_v3_config()
    if variant == "tiny":
        return tiny_config()
    raise ValueError(f"unknown whisper variant: {variant}")


# ---------------------------------------------------------------------------
# Init (hermetic tiny models / tests)
# ---------------------------------------------------------------------------


def _init_whisper_block(key, d: int, ffn: int, cross: bool) -> Dict:
    ks = jax.random.split(key, 4)
    p = {
        "self_attn": L.init_attention(ks[0], d, packed=False),
        "self_ln": L.init_layer_norm(d),
        "mlp": {"fc1": L.init_linear(ks[1], d, ffn), "fc2": L.init_linear(ks[2], ffn, d)},
        "final_ln": L.init_layer_norm(d),
    }
    p["self_attn"]["k_proj"].pop("bias", None)  # whisper: k_proj has no bias
    if cross:
        p["cross_attn"] = L.init_attention(ks[3], d, packed=False)
        p["cross_attn"]["k_proj"].pop("bias", None)
        p["cross_ln"] = L.init_layer_norm(d)
    return p


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper encoder positional embedding (sinusoidal)."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_whisper(key: jax.Array, cfg: WhisperConfig) -> Dict:
    ks = jax.random.split(key, 8)
    d = cfg.d_model
    enc_blocks = [
        _init_whisper_block(k, d, cfg.ffn, cross=False)
        for k in jax.random.split(ks[0], cfg.encoder_layers)
    ]
    dec_blocks = [
        _init_whisper_block(k, d, cfg.ffn, cross=True)
        for k in jax.random.split(ks[1], cfg.decoder_layers)
    ]
    return {
        "encoder": {
            "conv1": {
                "weight": 0.02 * jax.random.normal(ks[2], (d, cfg.n_mels, 3), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "conv2": {
                "weight": 0.02 * jax.random.normal(ks[3], (d, d, 3), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "pos_embed": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
            "blocks": L.stack_block_params(enc_blocks),
            "ln": L.init_layer_norm(d),
        },
        "decoder": {
            "token_embedding": 0.02
            * jax.random.normal(ks[4], (cfg.vocab_size, d), jnp.float32),
            "pos_embed": 0.01
            * jax.random.normal(ks[5], (cfg.max_target_positions, d), jnp.float32),
            "blocks": L.stack_block_params(dec_blocks),
            "ln": L.init_layer_norm(d),
        },
    }


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _whisper_block(p, x, heads, eps, mask=None, dtype=jnp.bfloat16, cross_kv=None):
    # residual stream kept in `dtype` (see layers.encoder_block: an fp32
    # stream halves effective bf16 matmul throughput); LN stats stay fp32
    x = x.astype(dtype)
    x = x + L.attention(
        p["self_attn"], L.layer_norm(p["self_ln"], x, eps, out_dtype=dtype),
        num_heads=heads, mask=mask, dtype=dtype,
    ).astype(dtype)
    if cross_kv is not None:
        x = x + L.attention(
            p["cross_attn"],
            L.layer_norm(p["cross_ln"], x, eps, out_dtype=dtype),
            x_kv=cross_kv,
            num_heads=heads,
            dtype=dtype,
        ).astype(dtype)
    x = x + L.mlp(
        p["mlp"], L.layer_norm(p["final_ln"], x, eps, out_dtype=dtype), dtype=dtype,
        cast_out=True,
    ).astype(dtype)
    return x


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def encoder_forward(params: Dict, mel: jax.Array, cfg: WhisperConfig, dtype=jnp.bfloat16):
    """mel (B, n_mels, T) -> (B, T//2, d). T must be 2*max_source_positions
    for checkpoint-positional parity (pad/trim in the caller)."""
    p = params["encoder"]
    x = mel.astype(dtype)
    # conv1: kernel 3 stride 1 pad 1, gelu
    x = jax.lax.conv_general_dilated(
        x, p["conv1"]["weight"].astype(dtype), (1,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"), preferred_element_type=jnp.float32,
    ) + p["conv1"]["bias"][None, :, None]
    x = L.gelu(x)
    # conv2: kernel 3 stride 2 pad 1, gelu
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), p["conv2"]["weight"].astype(dtype), (2,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"), preferred_element_type=jnp.float32,
    ) + p["conv2"]["bias"][None, :, None]
    x = L.gelu(x).transpose(0, 2, 1)  # (B, T/2, d)
    x = x + p["pos_embed"][None, : x.shape[1]].astype(jnp.float32)

    def body(h, pb):
        return _whisper_block(pb, h, cfg.heads, cfg.eps, dtype=dtype), None

    # carry dtype must be scan-invariant; blocks run the stream in `dtype`
    x, _ = jax.lax.scan(body, x.astype(dtype), p["blocks"])
    return L.layer_norm(p["ln"], x, cfg.eps)


# ---------------------------------------------------------------------------
# Decoder with KV cache
# ---------------------------------------------------------------------------


def _proj_heads(p, x, heads, dtype):
    """(B, T, D) -> (B, H, T, hd) through a linear proj."""
    y = L.linear(p, x, dtype)
    b, t, d = y.shape
    return y.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def decoder_forward(
    params: Dict, tokens: jax.Array, enc_out: jax.Array, cfg: WhisperConfig, dtype=jnp.bfloat16
):
    """Teacher-forced decoder: tokens (B, T) -> logits (B, T, vocab)."""
    p = params["decoder"]
    b, t = tokens.shape
    x = p["token_embedding"][tokens].astype(jnp.float32) + p["pos_embed"][None, :t].astype(
        jnp.float32
    )
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)

    def body(h, pb):
        return (
            _whisper_block(pb, h, cfg.heads, cfg.eps, mask=causal, dtype=dtype, cross_kv=enc_out),
            None,
        )

    x, _ = jax.lax.scan(body, x.astype(dtype), p["blocks"])
    x = L.layer_norm(p["ln"], x, cfg.eps)
    return jnp.dot(
        x.astype(dtype), p["token_embedding"].T.astype(dtype), preferred_element_type=jnp.float32
    )


def _cross_kv(params: Dict, enc_out: jax.Array, heads: int, dtype):
    """Pre-compute cross-attention K/V once per layer → (L, B, H, S, hd)."""

    def one(pb):
        k = _proj_heads(pb["cross_attn"]["k_proj"], enc_out, heads, dtype)
        v = _proj_heads(pb["cross_attn"]["v_proj"], enc_out, heads, dtype)
        return k, v

    return jax.vmap(one, in_axes=0)(params["decoder"]["blocks"])


def _step_layers(params, cfg, x, pos, self_k, self_v, xk, xv, max_len, dtype,
                 beam: int = 1):
    """One token (x: (rows, 1, d)) through all decoder layers with KV caches.

    `beam` > 1 declares that rows = B·beam hypothesis rows whose CROSS K/V
    are per-chunk (xk/xv are (L, B, H, S, hd), NOT beam-repeated): the cross
    attention groups the beam queries of a chunk against the chunk's single
    K/V, so the dominant HBM term of a beam step — re-reading the (H, S, hd)
    encoder caches once per hypothesis — drops by beam× (ViT-dissection r5:
    the repeated caches cost ~2.5 GB/step at b16·beam-5)."""
    d = x.shape[-1]
    heads, hd = cfg.heads, d // cfg.heads
    scale = 1.0 / np.sqrt(hd)

    def layer(carry, inp):
        h = carry
        pb, xk_l, xv_l, sk_l, sv_l = inp
        hn = L.layer_norm(pb["self_ln"], h, cfg.eps)
        q = _proj_heads(pb["self_attn"]["q_proj"], hn, heads, dtype)
        k_new = _proj_heads(pb["self_attn"]["k_proj"], hn, heads, dtype)
        v_new = _proj_heads(pb["self_attn"]["v_proj"], hn, heads, dtype)
        # caches live in the COMPUTE dtype: every read casts to `dtype`
        # anyway, so fp32 storage bought zero precision while doubling the
        # cache HBM traffic that dominates the decode step
        sk_l = jax.lax.dynamic_update_slice(sk_l, k_new.astype(sk_l.dtype), (0, 0, pos, 0))
        sv_l = jax.lax.dynamic_update_slice(sv_l, v_new.astype(sv_l.dtype), (0, 0, pos, 0))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(dtype), sk_l.astype(dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        key_mask = (jnp.arange(max_len) <= pos)[None, None, None, :]
        logits = jnp.where(key_mask, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum(
            "bhqk,bhkd->bhqd", w.astype(dtype), sv_l.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(h.shape[0], 1, d)
        h = h + L.linear(pb["self_attn"]["out_proj"], attn, dtype)
        # cross-attention against precomputed enc K/V (beam-grouped: the g
        # axis is the hypothesis index; K/V carry no beam axis)
        q = _proj_heads(pb["cross_attn"]["q_proj"], L.layer_norm(pb["cross_ln"], h, cfg.eps), heads, dtype)
        rows = q.shape[0]
        qg = q.reshape(rows // beam, beam, heads, 1, hd)
        logits = jnp.einsum(
            "bghqd,bhkd->bghqk", qg.astype(dtype), xk_l.astype(dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum(
            "bghqk,bhkd->bghqd", w.astype(dtype), xv_l.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        attn = attn.reshape(rows, heads, 1, hd).transpose(0, 2, 1, 3).reshape(rows, 1, d)
        h = h + L.linear(pb["cross_attn"]["out_proj"], attn, dtype)
        h = h + L.mlp(pb["mlp"], L.layer_norm(pb["final_ln"], h, cfg.eps), dtype=dtype)
        return h, (sk_l, sv_l)

    x, (self_k, self_v) = jax.lax.scan(
        layer, x, (params["decoder"]["blocks"], xk, xv, self_k, self_v)
    )
    return x, self_k, self_v


def _embed_at(p, tokens, pos, b, d):
    tok = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))
    return (
        p["token_embedding"][tok].astype(jnp.float32)
        + jax.lax.dynamic_slice(p["pos_embed"], (pos, 0), (1, d))[None].astype(jnp.float32)
    )


def _next_logits(params, cfg, tokens, pos, self_k, self_v, xk, xv, max_len, dtype,
                 beam: int = 1):
    """Process token at `pos` and return vocab logits for position pos+1."""
    p = params["decoder"]
    b = tokens.shape[0]
    d = p["token_embedding"].shape[1]
    x = _embed_at(p, tokens, pos, b, d)
    x, self_k, self_v = _step_layers(params, cfg, x, pos, self_k, self_v, xk, xv, max_len, dtype, beam)
    x = L.layer_norm(p["ln"], x, cfg.eps)
    logits = jnp.dot(
        x[:, 0].astype(dtype), p["token_embedding"].T.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, self_k, self_v


@partial(jax.jit, static_argnames=("cfg", "max_len", "dtype"))
def greedy_decode(
    params: Dict,
    enc_out: jax.Array,
    prompt: jax.Array,
    cfg: WhisperConfig,
    max_len: int = 224,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy autoregressive decode under jit.

    enc_out: (B, S, d); prompt: (B, P) forced decoder ids.
    Returns (tokens (B, max_len), lengths (B,)). Static shapes throughout:
    the while_loop exits early once every row has emitted <|endoftext|>.
    """
    p = params["decoder"]
    b, s, d = enc_out.shape
    heads, hd = cfg.heads, d // cfg.heads
    nl = cfg.decoder_layers
    plen = prompt.shape[1]

    xk, xv = _cross_kv(params, enc_out, heads, dtype)

    tokens = jnp.zeros((b, max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))
    self_k = jnp.zeros((nl, b, heads, max_len, hd), dtype)
    self_v = jnp.zeros_like(self_k)
    finished = jnp.zeros((b,), bool)
    lengths = jnp.full((b,), max_len, jnp.int32)

    # Prefill the prompt token-by-token (prompt is short: ≤4 ids).
    def prefill(i, carry):
        self_k, self_v = carry
        x = _embed_at(p, tokens, i, b, d)
        _, self_k, self_v = _step_layers(
            params, cfg, x, i, self_k, self_v, xk, xv, max_len, dtype
        )
        return self_k, self_v

    self_k, self_v = jax.lax.fori_loop(0, plen - 1, prefill, (self_k, self_v))

    def cond(state):
        pos, tokens, self_k, self_v, finished, lengths = state
        return jnp.logical_and(pos < max_len, ~jnp.all(finished))

    def body(state):
        pos, tokens, self_k, self_v, finished, lengths = state
        logits, self_k, self_v = _next_logits(
            params, cfg, tokens, pos - 1, self_k, self_v, xk, xv, max_len, dtype
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.eot_token, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos))
        now_done = nxt == cfg.eot_token
        lengths = jnp.where(now_done & ~finished, pos, lengths)
        finished = finished | now_done
        return pos + 1, tokens, self_k, self_v, finished, lengths

    state = (jnp.asarray(plen, jnp.int32), tokens, self_k, self_v, finished, lengths)
    _, tokens, _, _, finished, lengths = jax.lax.while_loop(cond, body, state)
    return tokens, lengths


@partial(jax.jit, static_argnames=("cfg", "max_len", "beam", "dtype"))
def beam_decode_batch(
    params: Dict,
    enc_out: jax.Array,
    prompt: jax.Array,
    cfg: WhisperConfig,
    max_len: int = 224,
    beam: int = 5,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """BATCHED beam-search decode under jit — B independent audio chunks, each
    with its own `beam` hypotheses, in ONE device program (the reference's
    faster-whisper runs chunks serially on the CTranslate2 C++ runtime,
    foundation_models.py:181-215).

    enc_out (B, S, d), prompt (B, P). All B·beam hypothesis rows ride the
    batch axis of the cached decode step: caches are (L, B·beam, H, max_len,
    hd); per-chunk beam re-ranking is a row-local top-k over (beam·V)
    candidates and cache reordering is one gather with chunk-offset indices.
    Finished hypotheses only propose EOT at zero added score. The while_loop
    exits once EVERY chunk's every hypothesis has finished.

    Returns (tokens (B, beam, max_len), lengths (B, beam), scores (B, beam))
    sorted per chunk by length-normalized log-prob, best first.
    """
    p = params["decoder"]
    bsz, s, d = enc_out.shape
    heads, hd = cfg.heads, d // cfg.heads
    nl = cfg.decoder_layers
    plen = prompt.shape[1]
    rows = bsz * beam
    neg = jnp.float32(-1e30)

    # project cross-K/V ONCE per chunk and keep them UN-repeated: the decode
    # step's cross attention groups each chunk's beam hypotheses against the
    # chunk's single (H, S, hd) K/V (see _step_layers), so the per-step HBM
    # read of the encoder caches — the beam loop's dominant bandwidth term,
    # ~2.5 GB/step repeated at b16·beam-5 — costs the same as greedy's
    xk, xv = _cross_kv(params, enc_out, heads, dtype)  # (L, B, H, S, hd)

    tokens = jnp.zeros((rows, max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.repeat(prompt.astype(jnp.int32), beam, axis=0), (0, 0)
    )
    self_k = jnp.zeros((nl, rows, heads, max_len, hd), dtype)
    self_v = jnp.zeros_like(self_k)
    # per chunk: hypothesis 0 starts live; others at -inf so the first
    # expansion fans out
    scores = jnp.full((bsz, beam), neg).at[:, 0].set(0.0)
    finished = jnp.zeros((rows,), bool)
    lengths = jnp.full((rows,), max_len, jnp.int32)

    def prefill(i, carry):
        self_k, self_v = carry
        x = _embed_at(p, tokens, i, rows, d)
        _, self_k, self_v = _step_layers(
            params, cfg, x, i, self_k, self_v, xk, xv, max_len, dtype, beam
        )
        return self_k, self_v

    self_k, self_v = jax.lax.fori_loop(0, plen - 1, prefill, (self_k, self_v))

    vocab = p["token_embedding"].shape[0]
    row_base = (jnp.arange(bsz, dtype=jnp.int32) * beam)[:, None]  # (B, 1)

    def cond(state):
        pos, *_, finished, _ = state
        return jnp.logical_and(pos < max_len, ~jnp.all(finished))

    def body(state):
        pos, tokens, self_k, self_v, scores, finished, lengths = state
        logits, self_k, self_v = _next_logits(
            params, cfg, tokens, pos - 1, self_k, self_v, xk, xv, max_len, dtype,
            beam,
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)  # (rows, V)
        # finished hypotheses: only EOT at zero cost (keeps them comparable)
        frozen = jnp.full((rows, vocab), neg).at[:, cfg.eot_token].set(0.0)
        logprobs = jnp.where(finished[:, None], frozen, logprobs)
        cand = scores.reshape(rows, 1) + logprobs  # (rows, V)
        # row-local (per chunk) top-k over this chunk's beam·V candidates.
        # (A two-stage per-row-top-beam reduction was measured IDENTICAL —
        # 3762.1 vs 3761.4 ms for the full b16 loop, scripts/asr_micro.py
        # 2026-08-21 — selection is not the beam step's cost; keep the
        # simpler flat select.)
        top_s, flat = jax.lax.top_k(cand.reshape(bsz, beam * vocab), beam)
        src = (row_base + (flat // vocab).astype(jnp.int32)).reshape(-1)  # (rows,)
        tok = (flat % vocab).astype(jnp.int32).reshape(-1)

        tokens = tokens[src]
        self_k = jnp.take(self_k, src, axis=1)
        self_v = jnp.take(self_v, src, axis=1)
        lengths = lengths[src]
        was_done = finished[src]
        tok = jnp.where(was_done, cfg.eot_token, tok)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, pos))
        now_done = tok == cfg.eot_token
        lengths = jnp.where(now_done & ~was_done, pos, lengths)
        return pos + 1, tokens, self_k, self_v, top_s, was_done | now_done, lengths

    state = (jnp.asarray(plen, jnp.int32), tokens, self_k, self_v, scores, finished, lengths)
    _, tokens, _, _, scores, finished, lengths = jax.lax.while_loop(cond, body, state)
    # rank each chunk's beams by length-normalized log-prob (faster-whisper)
    tokens = tokens.reshape(bsz, beam, max_len)
    lengths = lengths.reshape(bsz, beam)
    # normalize per GENERATED token including EOT (whose log-prob is in the
    # cumulative score — CT2 counts the EOS too); excluding it gave an
    # immediate-EOT empty hypothesis the same divisor as a 1-token one,
    # biasing ranking toward empty transcripts
    gen_len = jnp.maximum(lengths - plen + 1, 1).astype(jnp.float32)
    norm = scores / gen_len
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    norm = jnp.take_along_axis(norm, order, axis=1)
    return tokens, lengths, norm


def beam_decode(
    params: Dict,
    enc_out: jax.Array,
    prompt: jax.Array,
    cfg: WhisperConfig,
    max_len: int = 224,
    beam: int = 5,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-chunk convenience wrapper over beam_decode_batch.

    enc_out (1, S, d) → (tokens (beam, max_len), lengths (beam,),
    scores (beam,)), best hypothesis first."""
    tokens, lengths, norm = beam_decode_batch(
        params, enc_out, prompt, cfg, max_len=max_len, beam=beam, dtype=dtype
    )
    return tokens[0], lengths[0], norm[0]
