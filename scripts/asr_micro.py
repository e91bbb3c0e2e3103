"""ASR dissection micro (VERDICT r4 Next #3): where does a 300 s track's
transcription time go?

distil-large-v3 shape (32 enc layers / 2 dec layers, d=1280), random
weights, bf16 — the bench configuration. Rows are read-synced (dispatch
N, fetch last, subtract a ready-buffer read floor) like mlp_fused_micro.

Rows:
  mel          — batched log-mel frontend (10 chunks)
  encoder      — one 16-row bucket forward
  greedy_full  — greedy decode only (enc reused), max_len 228 (the bench's
                 worst case: random weights never emit EOT)
  greedy_64    — greedy decode capped at 64 new tokens (step-cost slope)
  beam5        — beam-5 decode only (80 rows), max_len 228
  beam5_64     — beam-5 capped at 64 new tokens
  e2e_300s     — transcribe() wall for 300 s (the product row)
  e2e_300s_b5  — same with beam_size=5 (the reference's decode config)

Usage: python -u scripts/asr_micro.py   (ideally via healthy_window_runner)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from hippomm_tpu.models.whisper.model import (
    beam_decode_batch,
    distil_large_v3_config,
    encoder_forward,
    greedy_decode,
    init_whisper,
)
from hippomm_tpu.models.whisper.transcribe import WhisperTranscriber
from hippomm_tpu.ops.mel import WhisperMel
from hippomm_tpu.utils.device import fetch, warm_transport

print("transport:", warm_transport(), flush=True)

cfg = distil_large_v3_config()
params = init_whisper(jax.random.PRNGKey(0), cfg)
dtype = jnp.bfloat16

SR = 16000
rng = np.random.default_rng(0)
t = np.arange(300 * SR) / SR
pcm = (0.2 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
pcm[60 * SR : 62 * SR] = 0.0
pcm[180 * SR : 183 * SR] = 0.0

chunks = np.stack([pcm[i * 30 * SR : (i + 1) * 30 * SR] for i in range(10)])
pad16 = np.concatenate([chunks, np.repeat(chunks[-1:], 6, axis=0)])

mel = WhisperMel(n_mels=cfg.n_mels)
nf = 2 * cfg.max_source_positions

prompt1 = np.asarray(
    [[cfg.bos_token, cfg.lang_en_token, cfg.task_transcribe_token]], np.int32
)
plen = prompt1.shape[1]


def timed(name, fn, first=lambda o: o, reps=4):
    try:
        fetch(first(fn()))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        fetch(first(outs[-1]))
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(first(outs[0]))
        floor = time.perf_counter() - t0
        dt = max(total - floor, 0.0) / reps * 1000
        print(f"{name:16s} {dt:9.1f} ms (floor {floor * 1000:.0f} ms)", flush=True)
        return round(dt, 1)
    except Exception as e:  # noqa: BLE001
        print(f"{name:16s} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
        return None


rows = {}
stacked = jnp.asarray(pad16)
rows["mel"] = timed("mel", lambda: jax.vmap(mel)(stacked)[:, :, :nf])
mels = jax.vmap(mel)(stacked)[:, :, :nf]
rows["encoder"] = timed(
    "encoder", lambda: encoder_forward(params, mels, cfg, dtype)
)
enc = encoder_forward(params, mels, cfg, dtype)
enc.block_until_ready()
prompt16 = jnp.asarray(np.repeat(prompt1, 16, axis=0))

rows["greedy_full"] = timed(
    "greedy_full",
    lambda: greedy_decode(params, enc, prompt16, cfg, max_len=plen + 224, dtype=dtype),
    first=lambda o: o[0],
)
rows["greedy_64"] = timed(
    "greedy_64",
    lambda: greedy_decode(params, enc, prompt16, cfg, max_len=plen + 64, dtype=dtype),
    first=lambda o: o[0],
)
rows["beam5"] = timed(
    "beam5",
    lambda: beam_decode_batch(params, enc, prompt16, cfg, max_len=plen + 224,
                              beam=5, dtype=dtype),
    first=lambda o: o[0],
    reps=2,
)
rows["beam5_64"] = timed(
    "beam5_64",
    lambda: beam_decode_batch(params, enc, prompt16, cfg, max_len=plen + 64,
                              beam=5, dtype=dtype),
    first=lambda o: o[0],
    reps=2,
)

# end-to-end product rows (wall, includes host chunking/parse)
tr1 = WhisperTranscriber(params, cfg, None, dtype, beam_size=1)
tr1.transcribe(pcm[: 30 * SR])  # warm
t0 = time.perf_counter()
tr1.transcribe(pcm)
rows["e2e_300s"] = round((time.perf_counter() - t0) * 1000, 1)
print(f"e2e_300s         {rows['e2e_300s']:9.1f} ms "
      f"({300.0 / (rows['e2e_300s'] / 1000):.1f}x realtime)", flush=True)

tr5 = WhisperTranscriber(params, cfg, None, dtype, beam_size=5)
tr5.transcribe(pcm[: 30 * SR])  # warm
t0 = time.perf_counter()
tr5.transcribe(pcm)
rows["e2e_300s_b5"] = round((time.perf_counter() - t0) * 1000, 1)
print(f"e2e_300s_b5      {rows['e2e_300s_b5']:9.1f} ms "
      f"({300.0 / (rows['e2e_300s_b5'] / 1000):.1f}x realtime)", flush=True)

print(json.dumps(rows), flush=True)
