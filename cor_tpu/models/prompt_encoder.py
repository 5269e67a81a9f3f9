"""Prompt encoders.

Two variants, mirroring the reference:

- ``prompt_encoder`` (the one the CORE build uses — reference:
  lib/sam_model/my_prompt_encoder.py): emits only the dense "no mask"
  embedding broadcast to the image-embedding grid, plus a random-Fourier
  dense positional encoding. The sparse prompt comes from the support branch.
- ``full_prompt_encoder`` (reference: lib/sam_model/prompt_encoder.py, kept
  in-tree but unused by the build): point/box/mask prompt embedding for stock
  SAM-style prompting, provided for API completeness.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.ops.common import (
    Params,
    init_conv2d,
    init_layer_norm,
    layer_norm,
    conv2d,
    gelu,
)


@dataclass(frozen=True)
class PromptEncoderConfig:
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16


# ---------------------------------------------------------------------------
# random-Fourier positional encoding
# (reference: lib/sam_model/my_prompt_encoder.py:177-218)
# ---------------------------------------------------------------------------


def init_position_embedding_random(
    key: jax.Array, num_pos_feats: int, scale: float = 1.0
) -> Params:
    if scale <= 0.0:
        scale = 1.0
    return {
        "gaussian_matrix": scale * jax.random.normal(key, (2, num_pos_feats), jnp.float32)
    }


def _pe_encoding(p: Params, coords: jax.Array) -> jax.Array:
    """coords in [0,1]^2, shape [..., 2] -> [..., 2*num_pos_feats]."""
    coords = 2.0 * coords - 1.0
    coords = coords @ p["gaussian_matrix"].astype(coords.dtype)
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def dense_positional_encoding(p: Params, size: Tuple[int, int]) -> jax.Array:
    """Positional grid [1, H, W, C] (reference returns C x H x W)."""
    h, w = size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(
        [jnp.broadcast_to(x[None, :], (h, w)), jnp.broadcast_to(y[:, None], (h, w))],
        axis=-1,
    )  # [H, W, 2] with (x, y) order, matching the reference's stack([x, y])
    return _pe_encoding(p, grid)[None]  # [1, H, W, C]


def encode_coords(p: Params, coords: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """Encode unnormalized pixel coords [..., 2] (x, y)."""
    c = coords.astype(jnp.float32)
    c = c.at[..., 0].divide(image_size[1])
    c = c.at[..., 1].divide(image_size[0])
    return _pe_encoding(p, c)


# ---------------------------------------------------------------------------
# stripped prompt encoder (the one CORE uses)
# ---------------------------------------------------------------------------


def init_prompt_encoder(key: jax.Array, cfg: PromptEncoderConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "pe_layer": init_position_embedding_random(k1, cfg.embed_dim // 2),
        # torch nn.Embedding(1, embed_dim) default init N(0, 1).
        # NOTE (checkpoint parity): the reference's checkpoint-surgery filter
        # never matches a stock SAM key for this weight, so it always trains
        # from scratch (reference: lib/build_model.py:100-109).
        "no_mask_embed": jax.random.normal(k2, (1, cfg.embed_dim), jnp.float32),
    }


def prompt_encoder_dense(p: Params, batch: int, cfg: PromptEncoderConfig) -> jax.Array:
    """Dense prompt: no_mask_embed broadcast to [B, H, W, C]
    (reference: my_prompt_encoder.py:128-174)."""
    h, w = cfg.image_embedding_size
    e = p["no_mask_embed"].reshape(1, 1, 1, cfg.embed_dim)
    return jnp.broadcast_to(e, (batch, h, w, cfg.embed_dim))


def get_dense_pe(p: Params, cfg: PromptEncoderConfig) -> jax.Array:
    return dense_positional_encoding(p["pe_layer"], cfg.image_embedding_size)


# ---------------------------------------------------------------------------
# full prompt encoder (stock SAM parity; points / boxes / masks)
# ---------------------------------------------------------------------------


def init_full_prompt_encoder(key: jax.Array, cfg: PromptEncoderConfig) -> Params:
    keys = jax.random.split(key, 10)
    d = cfg.embed_dim
    m = cfg.mask_in_chans
    return {
        "pe_layer": init_position_embedding_random(keys[0], d // 2),
        "point_embeddings": jax.random.normal(keys[1], (4, d), jnp.float32),
        "not_a_point_embed": jax.random.normal(keys[2], (1, d), jnp.float32),
        "no_mask_embed": jax.random.normal(keys[3], (1, d), jnp.float32),
        "mask_downscaling": {
            "conv1": init_conv2d(keys[4], 1, m // 4, 2),
            "ln1": init_layer_norm(m // 4),
            "conv2": init_conv2d(keys[5], m // 4, m, 2),
            "ln2": init_layer_norm(m),
            "conv3": init_conv2d(keys[6], m, d, 1),
        },
    }


def embed_points(
    p: Params,
    points: jax.Array,  # [B, N, 2]
    labels: jax.Array,  # [B, N] in {-1 pad, 0 neg, 1 pos}
    cfg: PromptEncoderConfig,
    pad: bool = True,
) -> jax.Array:
    if pad:
        B = points.shape[0]
        points = jnp.concatenate([points, jnp.zeros((B, 1, 2), points.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    pe = encode_coords(p["pe_layer"], points + 0.5, cfg.input_image_size)
    lab = labels[..., None]
    pe = jnp.where(lab == -1, p["not_a_point_embed"][0], pe)
    pe = pe + jnp.where(lab == 0, p["point_embeddings"][0], 0.0)
    pe = pe + jnp.where(lab == 1, p["point_embeddings"][1], 0.0)
    return pe


def embed_boxes(p: Params, boxes: jax.Array, cfg: PromptEncoderConfig) -> jax.Array:
    """boxes [B, 4] -> [B, 2, embed_dim]."""
    coords = (boxes + 0.5).reshape(-1, 2, 2)
    pe = encode_coords(p["pe_layer"], coords, cfg.input_image_size)
    pe = pe.at[:, 0, :].add(p["point_embeddings"][2])
    pe = pe.at[:, 1, :].add(p["point_embeddings"][3])
    return pe


def embed_masks(p: Params, masks: jax.Array, cfg: PromptEncoderConfig) -> jax.Array:
    """masks [B, 4H, 4W, 1] -> dense embedding [B, H, W, embed_dim]."""
    md = p["mask_downscaling"]
    x = conv2d(md["conv1"], masks, stride=2)
    x = gelu(layer_norm(md["ln1"], x, eps=1e-6))
    x = conv2d(md["conv2"], x, stride=2)
    x = gelu(layer_norm(md["ln2"], x, eps=1e-6))
    return conv2d(md["conv3"], x)


def full_prompt_encoder(
    p: Params,
    cfg: PromptEncoderConfig,
    points: Optional[Tuple[jax.Array, jax.Array]] = None,
    boxes: Optional[jax.Array] = None,
    masks: Optional[jax.Array] = None,
    batch: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sparse [B, N, C], dense [B, H, W, C]); static prompt presence."""
    d = cfg.embed_dim
    sparse_parts = []
    if points is not None:
        coords, labels = points
        batch = coords.shape[0]
        sparse_parts.append(embed_points(p, coords, labels, cfg, pad=(boxes is None)))
    if boxes is not None:
        batch = boxes.shape[0]
        sparse_parts.append(embed_boxes(p, boxes, cfg))
    sparse = (
        jnp.concatenate(sparse_parts, axis=1)
        if sparse_parts
        else jnp.zeros((batch, 0, d), jnp.float32)
    )
    if masks is not None:
        dense = embed_masks(p, masks, cfg)
    else:
        h, w = cfg.image_embedding_size
        dense = jnp.broadcast_to(
            p["no_mask_embed"].reshape(1, 1, 1, d), (batch, h, w, d)
        )
    return sparse, dense
