"""One-shot convert→forward parity at TRUE distil-large-v3 dims (CPU, fp32).

Companion to scripts/huge_parity_check.py (VERDICT r1 missing #1 residual —
real-checkpoint layouts were only shape-checked beyond tiny/mid dims). Builds
a random-init transformers WhisperModel at the distil-large-v3 configuration
the reference loads (foundation_models.py:164-168: d_model 1280, 32 encoder
layers, 2 decoder layers, vocab 51866, 128 mels), converts through the
production convert_state_dict, and compares encoder and tied-logits decoder
forwards numerically.

~750M params in fp32 twice: needs ~8 GB RAM and a few minutes single-core —
run manually, not in CI:

    JAX_PLATFORMS=cpu python scripts/large_whisper_parity_check.py

With the REAL checkpoint available (VERDICT r2 Missing #3 / Next #9):

    JAX_PLATFORMS=cpu python scripts/large_whisper_parity_check.py \
        --checkpoint /path/to/distil-large-v3

Writes docs/LARGE_WHISPER_PARITY.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

from hippomm_tpu.models.whisper.convert import convert_state_dict
from hippomm_tpu.models.whisper.model import (
    decoder_forward,
    distil_large_v3_config,
    encoder_forward,
)


def main() -> None:
    import argparse

    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--checkpoint",
        default="",
        help="path to a local distil-large-v3 HF checkpoint dir (safetensors); "
             "omitted = random weights at true dims (layout/convert parity only)",
    )
    args = ap.parse_args()

    cfg = distil_large_v3_config()
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
    t0 = time.time()
    torch.manual_seed(3)
    if args.checkpoint:
        model = WhisperModel.from_pretrained(args.checkpoint).eval().float()
        assert model.config.d_model == cfg.d_model, (
            model.config.d_model, cfg.d_model,
        )
        assert model.config.encoder_layers == cfg.encoder_layers
        assert model.config.decoder_layers == cfg.decoder_layers
        print(f"loaded {args.checkpoint}", flush=True)
    else:
        model = WhisperModel(hf_cfg).eval()
    n_params = sum(int(p.numel()) for p in model.parameters())
    params = convert_state_dict(model.state_dict(), cfg)
    print(f"built+converted {n_params/1e6:.0f}M params in {time.time()-t0:.0f}s",
          flush=True)

    report = {"n_params_m": round(n_params / 1e6, 1), "dims": "distil-large-v3"}
    rng = np.random.default_rng(21)

    # full 30 s window: (1, 128, 3000) mel
    mel = rng.normal(size=(1, cfg.n_mels, 2 * cfg.max_source_positions)).astype(np.float32)
    t0 = time.time()
    with torch.no_grad():
        want_e = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    enc = encoder_forward(params, jnp.asarray(mel), cfg, dtype=jnp.float32)
    got_e = np.asarray(enc)
    report["encoder_max_abs_err"] = float(np.max(np.abs(got_e - want_e)))
    print(f"encoder: max abs err {report['encoder_max_abs_err']:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)

    tokens = rng.integers(0, cfg.vocab_size, size=(1, 12)).astype(np.int64)
    t0 = time.time()
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).last_hidden_state
        want_d = (out @ model.decoder.embed_tokens.weight.T).numpy()
    got_d = np.asarray(
        decoder_forward(params, jnp.asarray(tokens.astype(np.int32)), enc, cfg,
                        dtype=jnp.float32)
    )
    report["decoder_logits_max_abs_err"] = float(np.max(np.abs(got_d - want_d)))
    print(f"decoder: max abs err {report['decoder_logits_max_abs_err']:.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # logits magnitude grows with d_model·random-init variance; scale-aware gate
    atol_enc = 3e-4
    atol_dec = 3e-3
    report["tolerance"] = {"encoder": atol_enc, "decoder_logits": atol_dec}
    report["pass"] = bool(
        report["encoder_max_abs_err"] < atol_enc
        and report["decoder_logits_max_abs_err"] < atol_dec
    )
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "docs", "LARGE_WHISPER_PARITY.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
