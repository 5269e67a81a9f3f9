"""SigLIP image/text towers, TPU-native.

Capability parity with the reference's open_clip-backed SigLIP wrapper
(reference: lib/support_model/siglip_openclip.py:7-64):

- image tower: timm-style ViT (patch conv, learned pos embed, no cls token,
  pre-LN blocks, final norm) + MAP attention-pooling head for the global
  embedding. `encode_image` returns both the L2-normed global feature and the
  post-norm patch-token grid [B, Hp, Wp, D] (NHWC; reference emits NCHW
  [B, D, 27, 27] for SO400M / [B, D, 24, 24] for B-16).
- text tower: token embedding + learned positional embedding, pre-LN blocks
  with NO causal mask, final LN, last-token pooling, linear projection with
  bias (open_clip TextTransformer SigLIP configuration).

The towers are frozen in CORE (reference: lib/build_model.py:112-114); weights
are converted from open_clip checkpoints via cor_tpu.utils.convert.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cor_tpu.ops.attention import attention_seq, init_attention_seq
from cor_tpu.ops.pallas.layernorm import layer_norm_pallas
from cor_tpu.ops.common import (
    Params,
    _torch_uniform,
    dense,
    init_dense,
    init_layer_norm,
    init_mlp_block,
    layer_norm,
    mlp_block,
    l2_normalize,
    trunc_normal,
)


@dataclass(frozen=True)
class SigLIPVisionConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        # conv with VALID padding: floor((img - patch)/patch) + 1
        return (self.image_size - self.patch_size) // self.patch_size + 1

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


@dataclass(frozen=True)
class SigLIPTextConfig:
    context_length: int = 64
    vocab_size: int = 32000
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6


@dataclass(frozen=True)
class SigLIPConfig:
    vision: SigLIPVisionConfig = SigLIPVisionConfig()
    text: SigLIPTextConfig = SigLIPTextConfig()

    @property
    def embed_dim(self) -> int:
        return self.vision.width


# model-name table (reference: lib/support_branch.py:19-26 picks siglip_dim
# from these names; the reference training config uses ViT-B-16-SigLIP-384)
SIGLIP_MODELS: Dict[str, SigLIPConfig] = {
    "ViT-B-16-SigLIP-384": SigLIPConfig(
        SigLIPVisionConfig(384, 16, 768, 12, 12), SigLIPTextConfig(64, 32000, 768, 12, 12)
    ),
    "ViT-B-16-SigLIP2-384": SigLIPConfig(
        SigLIPVisionConfig(384, 16, 768, 12, 12), SigLIPTextConfig(64, 256000, 768, 12, 12)
    ),
    "ViT-L-16-SigLIP-384": SigLIPConfig(
        SigLIPVisionConfig(384, 16, 1024, 24, 16), SigLIPTextConfig(64, 32000, 1024, 24, 16)
    ),
    "ViT-L-16-SigLIP2-384": SigLIPConfig(
        SigLIPVisionConfig(384, 16, 1024, 24, 16), SigLIPTextConfig(64, 256000, 1024, 24, 16)
    ),
    "ViT-SO400M-14-SigLIP-384": SigLIPConfig(
        SigLIPVisionConfig(384, 14, 1152, 27, 16, mlp_ratio=3.7362),
        SigLIPTextConfig(64, 32000, 1152, 27, 16, mlp_ratio=3.7362),
    ),
}


def siglip_dim(model_name: str) -> int:
    if model_name not in SIGLIP_MODELS:
        raise ValueError(f"Invalid SigLIP model: {model_name}")
    return SIGLIP_MODELS[model_name].embed_dim


# ---------------------------------------------------------------------------
# shared pre-LN transformer block (timm/open_clip style)
# ---------------------------------------------------------------------------


def _init_block(key: jax.Array, width: int, mlp_hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm1": init_layer_norm(width),
        "attn": init_attention_seq(k1, width),
        "norm2": init_layer_norm(width),
        "mlp": init_mlp_block(k2, width, mlp_hidden),
    }


def _ln(p: Params, x: jax.Array, eps: float) -> jax.Array:
    # single-pass Pallas LayerNorm; safe on all paths (towers frozen under
    # stop_gradient); falls back to XLA off-TPU / odd shapes
    return layer_norm_pallas(x, p["scale"], p["bias"], eps=eps)


def _block(bp: Params, x: jax.Array, num_heads: int, eps: float) -> jax.Array:
    x = x + attention_seq(bp["attn"], _ln(bp["norm1"], x, eps), num_heads)
    x = x + mlp_block(bp["mlp"], _ln(bp["norm2"], x, eps))
    return x


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------


def init_siglip_vision(key: jax.Array, cfg: SigLIPVisionConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    kpw, kpb = jax.random.split(keys[0])
    mlp_hidden = int(round(cfg.width * cfg.mlp_ratio))
    p: Params = {
        "patch_embed": {
            "w": _torch_uniform(kpw, (patch_dim, cfg.width), patch_dim),
            "b": _torch_uniform(kpb, (cfg.width,), patch_dim),
        },
        "pos_embed": trunc_normal(keys[1], (1, cfg.num_patches, cfg.width)),
        "blocks": [
            _init_block(keys[2 + i], cfg.width, mlp_hidden) for i in range(cfg.depth)
        ],
        "norm": init_layer_norm(cfg.width),
    }
    # MAP attention-pooling head (timm AttentionPoolLatent)
    kh = jax.random.split(keys[-1], 5)
    p["attn_pool"] = {
        "latent": trunc_normal(kh[0], (1, 1, cfg.width)),
        "q": init_dense(kh[1], cfg.width, cfg.width),
        "kv": init_dense(kh[2], cfg.width, 2 * cfg.width),
        "proj": init_dense(kh[3], cfg.width, cfg.width),
        "norm": init_layer_norm(cfg.width),
        "mlp": init_mlp_block(kh[4], cfg.width, mlp_hidden),
    }
    return p


def _map_head(p: Params, x: jax.Array, num_heads: int, eps: float) -> jax.Array:
    """Attention pooling with a learned latent probe -> [B, width]."""
    B, N, C = x.shape
    head_dim = C // num_heads
    q = dense(p["q"], jnp.broadcast_to(p["latent"].astype(x.dtype), (B, 1, C)))
    kv = dense(p["kv"], x).reshape(B, N, 2, num_heads, head_dim)
    kv = kv.transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    qh = q.reshape(B, 1, num_heads, head_dim).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, k, preferred_element_type=jnp.float32) / (
        head_dim**0.5
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, 1, C)
    out = dense(p["proj"], out)
    out = out + mlp_block(p["mlp"], layer_norm(p["norm"], out, eps))
    return out[:, 0]


def siglip_vision(
    p: Params, images: jax.Array, cfg: SigLIPVisionConfig
) -> Tuple[jax.Array, jax.Array]:
    """images [B, S, S, 3] -> (pooled [B, width], patch grid [B, g, g, width]).

    pooled is NOT normalized here; callers L2-norm for the retrieval space
    (reference normalizes in get_img_siglip_feature, siglip_openclip.py:27).
    """
    B = images.shape[0]
    ps = cfg.patch_size
    g = cfg.grid
    # VALID-padding patchify (handles 384/14 -> 27 by cropping the remainder,
    # exactly what a stride-14 VALID conv does)
    crop = g * ps
    x = images[:, :crop, :crop, :]
    x = x.reshape(B, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, ps * ps * 3)
    x = dense(p["patch_embed"], x)  # [B, N, width]
    x = x + p["pos_embed"].astype(x.dtype)
    for bp in p["blocks"]:
        x = _block(bp, x, cfg.num_heads, cfg.ln_eps)
    tokens = _ln(p["norm"], x, cfg.ln_eps)  # [B, N, width]
    pooled = _map_head(p["attn_pool"], tokens, cfg.num_heads, cfg.ln_eps)
    grid_tokens = tokens.reshape(B, g, g, cfg.width)
    return pooled, grid_tokens


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------


def init_siglip_text(key: jax.Array, cfg: SigLIPTextConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 4)
    mlp_hidden = int(round(cfg.width * cfg.mlp_ratio))
    return {
        "token_embedding": trunc_normal(keys[0], (cfg.vocab_size, cfg.width), std=0.02),
        "positional_embedding": trunc_normal(keys[1], (cfg.context_length, cfg.width), std=0.01),
        "blocks": [
            _init_block(keys[2 + i], cfg.width, mlp_hidden) for i in range(cfg.depth)
        ],
        "ln_final": init_layer_norm(cfg.width),
        "text_projection": init_dense(keys[-1], cfg.width, cfg.width),
    }


def siglip_text(p: Params, token_ids: jax.Array, cfg: SigLIPTextConfig) -> jax.Array:
    """token_ids [B, context_length] int32 -> text features [B, width].

    Pooling: last token (SigLIP pads to full context; the last position is the
    pool target in open_clip's pool_type='last').
    """
    x = p["token_embedding"][token_ids]
    x = x + p["positional_embedding"][None].astype(x.dtype)
    for bp in p["blocks"]:
        x = _block(bp, x, cfg.num_heads, cfg.ln_eps)
    x = _ln(p["ln_final"], x, cfg.ln_eps)
    pooled = x[:, -1]
    return dense(p["text_projection"], pooled)


# ---------------------------------------------------------------------------
# combined
# ---------------------------------------------------------------------------


def init_siglip(key: jax.Array, cfg: SigLIPConfig) -> Params:
    kv, kt = jax.random.split(key)
    return {"visual": init_siglip_vision(kv, cfg.vision), "text": init_siglip_text(kt, cfg.text)}


def siglip_encode(
    p: Params, images: jax.Array, token_ids: jax.Array, cfg: SigLIPConfig
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (image_features L2-normed [B, D], text_features L2-normed [B, D],
    patch grid [B, g, g, D]) — the reference wrapper's forward contract
    (siglip_openclip.py:61-64), minus the redundant NQC copy."""
    pooled, grid_tokens = siglip_vision(p["visual"], images, cfg.vision)
    image_features = l2_normalize(pooled)
    text_features = l2_normalize(siglip_text(p["text"], token_ids, cfg.text))
    return image_features, text_features, grid_tokens
