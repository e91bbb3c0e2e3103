"""Convert HuggingFace `WhisperModel` state_dicts to hippomm_tpu Whisper params.

Any openai/whisper-* or distil-whisper checkpoint hosted in transformers format
loads through this (the reference uses faster-whisper's own CTranslate2
conversion of the same weights, foundation_models.py:164-168).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hippomm_tpu.models.whisper.model import WhisperConfig


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def _attn(sd: Dict, base: str, depth: int, prefix: str) -> Dict:
    def grab(name, bias=True):
        out = {"weight": np.stack([_np(sd[f"{base}.{i}.{prefix}.{name}.weight"]) for i in range(depth)])}
        key0 = f"{base}.0.{prefix}.{name}.bias"
        if bias and key0 in sd:
            out["bias"] = np.stack([_np(sd[f"{base}.{i}.{prefix}.{name}.bias"]) for i in range(depth)])
        return out

    return {
        "q_proj": grab("q_proj"),
        "k_proj": grab("k_proj", bias=False),  # whisper k_proj is bias-free
        "v_proj": grab("v_proj"),
        "out_proj": grab("out_proj"),
    }


def _ln(sd: Dict, base: str, depth: int, name: str) -> Dict:
    return {
        "weight": np.stack([_np(sd[f"{base}.{i}.{name}.weight"]) for i in range(depth)]),
        "bias": np.stack([_np(sd[f"{base}.{i}.{name}.bias"]) for i in range(depth)]),
    }


def _mlp(sd: Dict, base: str, depth: int) -> Dict:
    def grab(name):
        return {
            "weight": np.stack([_np(sd[f"{base}.{i}.{name}.weight"]) for i in range(depth)]),
            "bias": np.stack([_np(sd[f"{base}.{i}.{name}.bias"]) for i in range(depth)]),
        }

    return {"fc1": grab("fc1"), "fc2": grab("fc2")}


def convert_state_dict(sd: Dict, cfg: WhisperConfig) -> Dict:
    """HF WhisperModel state_dict → hippomm_tpu param pytree.

    Accepts both `model.encoder...` (WhisperForConditionalGeneration) and
    `encoder...` (WhisperModel) prefixes.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model.") :]: v for k, v in sd.items() if k.startswith("model.")}

    eb = "encoder.layers"
    db = "decoder.layers"
    enc_blocks = {
        "self_attn": _attn(sd, eb, cfg.encoder_layers, "self_attn"),
        "self_ln": _ln(sd, eb, cfg.encoder_layers, "self_attn_layer_norm"),
        "mlp": _mlp(sd, eb, cfg.encoder_layers),
        "final_ln": _ln(sd, eb, cfg.encoder_layers, "final_layer_norm"),
    }
    dec_blocks = {
        "self_attn": _attn(sd, db, cfg.decoder_layers, "self_attn"),
        "self_ln": _ln(sd, db, cfg.decoder_layers, "self_attn_layer_norm"),
        "cross_attn": _attn(sd, db, cfg.decoder_layers, "encoder_attn"),
        "cross_ln": _ln(sd, db, cfg.decoder_layers, "encoder_attn_layer_norm"),
        "mlp": _mlp(sd, db, cfg.decoder_layers),
        "final_ln": _ln(sd, db, cfg.decoder_layers, "final_layer_norm"),
    }
    return {
        "encoder": {
            "conv1": {"weight": _np(sd["encoder.conv1.weight"]), "bias": _np(sd["encoder.conv1.bias"])},
            "conv2": {"weight": _np(sd["encoder.conv2.weight"]), "bias": _np(sd["encoder.conv2.bias"])},
            "pos_embed": _np(sd["encoder.embed_positions.weight"]),
            "blocks": enc_blocks,
            "ln": {"weight": _np(sd["encoder.layer_norm.weight"]), "bias": _np(sd["encoder.layer_norm.bias"])},
        },
        "decoder": {
            "token_embedding": _np(sd["decoder.embed_tokens.weight"]),
            "pos_embed": _np(sd["decoder.embed_positions.weight"]),
            "blocks": dec_blocks,
            "ln": {"weight": _np(sd["decoder.layer_norm.weight"]), "bias": _np(sd["decoder.layer_norm.bias"])},
        },
    }


def checkpoint_depths(sd: Dict) -> Dict[str, int]:
    """(encoder_layers, decoder_layers) present in a checkpoint's keys."""
    import re

    out = {"encoder": 0, "decoder": 0}
    for k in sd:
        m = re.match(r"(?:model\.)?(encoder|decoder)\.layers\.(\d+)\.", k)
        if m:
            out[m.group(1)] = max(out[m.group(1)], int(m.group(2)) + 1)
    return out


def validate_state_dict(sd: Dict, cfg: WhisperConfig) -> None:
    """Depth + width sanity BEFORE conversion: a wrong-variant checkpoint
    (e.g. 32-layer large-v3 weights under the 2-layer distil config) would
    otherwise silently truncate into a garbage model with no diagnostic."""
    depths = checkpoint_depths(sd)
    if depths["encoder"] != cfg.encoder_layers or depths["decoder"] != cfg.decoder_layers:
        raise ValueError(
            f"Whisper checkpoint has encoder={depths['encoder']}/"
            f"decoder={depths['decoder']} layers but the config expects "
            f"{cfg.encoder_layers}/{cfg.decoder_layers} — wrong variant? "
            "(set models.whisper_variant to match the checkpoint)"
        )
    for k, v in sd.items():
        if k.endswith("embed_tokens.weight") or k.endswith("token_embedding.weight"):
            shape = tuple(getattr(v, "shape", ()))
            if shape and shape != (cfg.vocab_size, cfg.d_model):
                raise ValueError(
                    f"Whisper checkpoint token embedding {shape} != expected "
                    f"({cfg.vocab_size}, {cfg.d_model})"
                )


def load_whisper(checkpoint_path: str, cfg: WhisperConfig) -> Dict:
    from hippomm_tpu.models.ckpt_io import load_state_dict

    sd = load_state_dict(checkpoint_path)
    validate_state_dict(sd, cfg)
    return convert_state_dict(sd, cfg)
