"""Torch mini-reference of the ImageBind architecture with state_dict names
identical to the public imagebind_huge.pth checkpoint layout.

Test-only: gives hermetic parity oracles for hippomm_tpu.models.imagebind
(model math vs torch ops, converter vs checkpoint naming) without network
access. Built at tiny dims; the architecture/naming is dimension-agnostic.
"""

import math

import torch
import torch.nn as nn


class Mlp(nn.Module):
    def __init__(self, d, hidden):
        super().__init__()
        self.fc1 = nn.Linear(d, hidden)
        self.fc2 = nn.Linear(hidden, d)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, d, heads, mlp_ratio=4.0, eps=1e-6, add_bias_kv=False):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True, add_bias_kv=add_bias_kv)
        self.norm_1 = nn.LayerNorm(d, eps=eps)
        self.norm_2 = nn.LayerNorm(d, eps=eps)
        self.mlp = Mlp(d, int(d * mlp_ratio))

    def forward(self, x, attn_mask=None):
        h = self.norm_1(x)
        a, _ = self.attn(h, h, h, attn_mask=attn_mask, need_weights=False)
        x = x + a
        return x + self.mlp(self.norm_2(x))


class Trunk(nn.Module):
    def __init__(self, d, depth, heads, pre_ln=False, eps=1e-6, add_bias_kv=False):
        super().__init__()
        if pre_ln:
            self.pre_transformer_layer = nn.Sequential(nn.LayerNorm(d, eps=eps))
        self.blocks = nn.ModuleList(
            [Block(d, heads, eps=eps, add_bias_kv=add_bias_kv) for _ in range(depth)]
        )

    def forward(self, x, attn_mask=None):
        if hasattr(self, "pre_transformer_layer"):
            x = self.pre_transformer_layer(x)
        for b in self.blocks:
            x = b(x, attn_mask)
        return x


class _PosHelper(nn.Module):
    def __init__(self, n, d):
        super().__init__()
        self.pos_embed = nn.Parameter(torch.zeros(1, n, d))


class VisionPreprocessor(nn.Module):
    def __init__(self, d, patch, ntok):
        super().__init__()
        stem = nn.Module()
        stem.proj = nn.Sequential(
            nn.Identity(), nn.Conv3d(3, d, (2, patch, patch), (2, patch, patch), bias=False)
        )
        self.rgbt_stem = stem
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embedding_helper = _PosHelper(ntok, d)

    def forward(self, img):
        # 2-frame repeat pad (PadIm2Video) then 3-D patchify
        clip = img.unsqueeze(2).repeat(1, 1, 2, 1, 1)
        x = self.rgbt_stem.proj(clip)  # (B, d, 1, h, w)
        b, d = x.shape[:2]
        x = x.reshape(b, d, -1).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        return x + self.pos_embedding_helper.pos_embed


class AudioPreprocessor(nn.Module):
    def __init__(self, d, kernel, stride, ntok, eps=1e-6):
        super().__init__()
        stem = nn.Module()
        stem.proj = nn.Sequential(nn.Conv2d(1, d, kernel, stride, bias=False))
        stem.norm_layer = nn.LayerNorm(d, eps=eps)
        self.audio_stem = stem
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embedding_helper = _PosHelper(ntok, d)

    def forward(self, mel):
        x = self.audio_stem.proj(mel)
        b, d = x.shape[:2]
        x = x.reshape(b, d, -1).transpose(1, 2)
        x = self.audio_stem.norm_layer(x)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        return x + self.pos_embedding_helper.pos_embed


class TextPreprocessor(nn.Module):
    def __init__(self, vocab, ctx, d):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, d)
        self.pos_embed = nn.Parameter(torch.zeros(1, ctx, d))

    def forward(self, tokens):
        return self.token_embedding(tokens) + self.pos_embed[:, : tokens.shape[1]]


class TextHead(nn.Module):
    def __init__(self, d, out, eps=1e-6):
        super().__init__()
        self.proj = nn.Sequential(nn.LayerNorm(d, eps=eps), nn.Linear(d, out, bias=False))

    def forward(self, x, tokens):
        x = self.proj[0](x)
        eos = tokens.argmax(dim=-1)
        x = x[torch.arange(x.shape[0]), eos]
        return self.proj[1](x)


class TextPost(nn.Module):
    def __init__(self):
        super().__init__()
        scale = nn.Module()
        scale.log_logit_scale = nn.Parameter(torch.tensor(math.log(1 / 0.07)))
        # index 1 in a Sequential(Normalize, LearnableLogitScaling) layout
        self.seq = nn.ModuleList([nn.Identity(), scale])

    def forward(self, x):
        x = torch.nn.functional.normalize(x, dim=-1)
        return x * torch.exp(self.seq[1].log_logit_scale)


class MiniImageBind(nn.Module):
    """Tiny ImageBind with checkpoint-compatible state_dict keys."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        v, a, t = cfg.vision, cfg.audio, cfg.text
        self.modality_preprocessors = nn.ModuleDict(
            {
                "vision": VisionPreprocessor(v.width, cfg.patch_size, cfg.vision_tokens),
                "audio": AudioPreprocessor(
                    a.width, cfg.audio_kernel, cfg.audio_stride, cfg.audio_tokens
                ),
                "text": TextPreprocessor(cfg.vocab_size, cfg.context_length, t.width),
            }
        )
        self.modality_trunks = nn.ModuleDict(
            {
                "vision": Trunk(v.width, v.depth, v.heads, pre_ln=True),
                # the public audio trunk passes add_bias_kv=True (imagebind_model.py)
                "audio": Trunk(a.width, a.depth, a.heads, add_bias_kv=True),
                "text": Trunk(t.width, t.depth, t.heads),
            }
        )
        self.modality_heads = nn.ModuleDict(
            {
                "vision": nn.Sequential(
                    nn.LayerNorm(v.width, eps=1e-6),
                    nn.Identity(),
                    nn.Linear(v.width, cfg.embed_dim, bias=False),
                ),
                "audio": nn.Sequential(
                    nn.LayerNorm(a.width, eps=1e-6),
                    nn.Identity(),
                    nn.Linear(a.width, cfg.embed_dim, bias=False),
                ),
                "text": TextHead(t.width, cfg.embed_dim),
            }
        )
        self.modality_postprocessors = nn.ModuleDict({"text": TextPost()})
        with torch.no_grad():
            for p in self.parameters():
                if p.ndim > 1:
                    p.normal_(0, 0.02)
                else:
                    p.normal_(0, 0.01)

    # renames: TextPost.seq.1 -> postprocessors.text.1 (ckpt layout)
    def checkpoint_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("modality_postprocessors.text.seq.1", "modality_postprocessors.text.1")
            sd[k] = v
        return sd

    @torch.no_grad()
    def forward_vision(self, img):
        x = self.modality_preprocessors["vision"](img)
        x = self.modality_trunks["vision"](x)
        h = self.modality_heads["vision"]
        x = h[2](h[0](x)[:, 0])
        return torch.nn.functional.normalize(x, dim=-1)

    @torch.no_grad()
    def forward_audio(self, mel):
        x = self.modality_preprocessors["audio"](mel)
        x = self.modality_trunks["audio"](x)
        h = self.modality_heads["audio"]
        x = h[2](h[0](x)[:, 0])
        return torch.nn.functional.normalize(x, dim=-1) * self.cfg.audio_logit_scale

    @torch.no_grad()
    def forward_text(self, tokens):
        x = self.modality_preprocessors["text"](tokens)
        t = tokens.shape[1]
        mask = torch.full((t, t), float("-inf")).triu(1)
        x = self.modality_trunks["text"](x, attn_mask=mask)
        x = self.modality_heads["text"](x, tokens)
        return self.modality_postprocessors["text"](x)
