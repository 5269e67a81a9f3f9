"""Mask-conditioned pooling of the SigLIP patch grid.

Two strategies, selected by config exactly like the reference
(reference: lib/support_branch.py:29-40):

- ``masked_pooling``: bilinear-resize mask to the feature grid, masked
  average pool (reference: lib/support_model/mask_adapter.py:7-25).
- ``MaskAdapterPooling``: learned pooling — channel reduction, a
  mask-downscaling CNN added to the features, 3 ConvNeXt blocks, a 1x1 head
  producing `num_output_maps` activation maps, softmax(logsigmoid(maps)) over
  pixels as attention weights, weighted pooling of the ORIGINAL features,
  mean over maps (reference: lib/support_model/mask_adapter.py:28-179).

All tensors NHWC. The ConvNeXt depthwise 7x7 is a grouped NHWC conv; the 1x1
convs are channel matmuls on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from cor_tpu.ops.common import (
    Params,
    conv2d,
    dense,
    drop_path,
    gelu,
    init_conv2d,
    init_dense,
    init_layer_norm,
    layer_norm,
)
from cor_tpu.ops.resize import resize_bilinear


@dataclass(frozen=True)
class MaskAdapterConfig:
    x_in_channel: int = 768  # SigLIP width
    adapter_in_channel: int = 512  # reference: support_branch.py:32
    mask_downscaling_mid_channel: int = 16
    adapter_mid_channel: int = 256
    num_output_maps: int = 8  # reference: support_branch.py:35
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6


# ---------------------------------------------------------------------------
# plain masked pooling
# ---------------------------------------------------------------------------


def masked_pooling(features: jax.Array, mask: jax.Array) -> jax.Array:
    """features [B, H, W, C], mask [B, h, w, 1] -> [B, 1, C].

    Masked average pool with the reference's 1e-8 stabilizer
    (mask_adapter.py:22-24).
    """
    mask = resize_bilinear(mask, features.shape[1:3]).astype(features.dtype)
    num = jnp.sum(features * mask, axis=(1, 2))  # [B, C]
    den = jnp.sum(mask, axis=(1, 2)) + 1e-8  # [B, 1]
    return (num / den)[:, None, :]


# ---------------------------------------------------------------------------
# ConvNeXt block
# ---------------------------------------------------------------------------


def init_convnext_block(
    key: jax.Array, dim: int, kernel: int = 7, layer_scale_init: float = 1e-6
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "dwconv": init_conv2d(k1, dim, dim, kernel, groups=dim),
        "norm": init_layer_norm(dim),
        "pwconv1": init_dense(k2, dim, 4 * dim),
        "pwconv2": init_dense(k3, 4 * dim, dim),
    }
    if layer_scale_init > 0:
        p["gamma"] = layer_scale_init * jnp.ones((dim,), jnp.float32)
    return p


def convnext_block(
    p: Params,
    x: jax.Array,
    kernel: int = 7,
    drop_rate: float = 0.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    inp = x
    x = conv2d(p["dwconv"], x, padding=kernel // 2, groups=x.shape[-1])
    x = layer_norm(p["norm"], x, eps=1e-6)
    x = dense(p["pwconv1"], x)
    x = gelu(x)
    x = dense(p["pwconv2"], x)
    if "gamma" in p:
        x = p["gamma"].astype(x.dtype) * x
    x = drop_path(x, drop_rate, key, train)
    return inp + x


# ---------------------------------------------------------------------------
# MaskAdapterPooling
# ---------------------------------------------------------------------------


def init_mask_adapter_pooling(key: jax.Array, cfg: MaskAdapterConfig) -> Params:
    if cfg.drop_path_rate > 0.0:
        # the reference NEVER enables stochastic depth in this module
        # (ConvNextBlock(dim) keeps the 0.0 default, mask_adapter.py:118-124
        # vs :194), so the adapter's ConvNeXt calls are not wired for it —
        # fail loudly rather than silently training without the regularizer
        raise ValueError(
            "MaskAdapterConfig.drop_path_rate > 0 is not wired into the "
            "adapter's ConvNeXt blocks (the reference never enables it); "
            "set it to 0.0"
        )
    keys = jax.random.split(key, 10)
    mdc = cfg.mask_downscaling_mid_channel
    return {
        "channel_reduction": {
            "conv": init_conv2d(keys[0], cfg.x_in_channel, cfg.adapter_in_channel, 1),
            "norm": init_layer_norm(cfg.adapter_in_channel),
        },
        "mask_downscaling": {
            "conv1": init_conv2d(keys[1], 1, mdc // 4, 3),
            "ln1": init_layer_norm(mdc // 4),
            "conv2": init_conv2d(keys[2], mdc // 4, mdc, 3),
            "ln2": init_layer_norm(mdc),
            "conv3": init_conv2d(keys[3], mdc, cfg.adapter_in_channel, 1),
        },
        "fuse": init_conv2d(keys[4], cfg.adapter_in_channel, cfg.adapter_mid_channel, 1),
        "cnext1": init_convnext_block(keys[5], cfg.adapter_mid_channel, 7, cfg.layer_scale_init),
        "cnext2": init_convnext_block(keys[6], cfg.adapter_mid_channel, 7, cfg.layer_scale_init),
        "cnext3": init_convnext_block(keys[7], cfg.adapter_mid_channel, 7, cfg.layer_scale_init),
        "norm": init_layer_norm(cfg.adapter_mid_channel),
        "final": init_conv2d(keys[8], cfg.adapter_mid_channel, cfg.num_output_maps, 1),
    }


def _generate_mask_adapter_map(
    p: Params, clip_feature: jax.Array, mask: jax.Array, cfg: MaskAdapterConfig
) -> jax.Array:
    """clip_feature [B, H, W, Cin], mask [B, H, W, 1] -> maps [B, H, W, M].

    Reference: GenerateMaskAdapterMap (mask_adapter.py:97-179) with N=1 query.
    """
    H, W = clip_feature.shape[1:3]
    md = p["mask_downscaling"]
    m = resize_bilinear(mask.astype(clip_feature.dtype), (H * 4, W * 4))
    m = conv2d(md["conv1"], m, stride=2, padding=1)
    m = gelu(layer_norm(md["ln1"], m, eps=1e-6))
    m = conv2d(md["conv2"], m, stride=2, padding=1)
    m = gelu(layer_norm(md["ln2"], m, eps=1e-6))
    m = conv2d(md["conv3"], m)

    x = clip_feature + m
    x = conv2d(p["fuse"], x)
    x = convnext_block(p["cnext1"], x)
    x = convnext_block(p["cnext2"], x)
    x = convnext_block(p["cnext3"], x)
    x = layer_norm(p["norm"], x, eps=1e-6)
    return conv2d(p["final"], x)  # [B, H, W, M]


def mask_adapter_pooling(
    p: Params, features: jax.Array, mask: jax.Array, cfg: MaskAdapterConfig
) -> jax.Array:
    """features [B, H, W, C], mask [B, h, w, 1] -> pooled [B, 1, C]."""
    B, H, W, C = features.shape
    # NOTE: the mask is resized DOWN to the 27x27 feature grid here and then
    # _generate_mask_adapter_map immediately resizes it back UP 4x — that
    # detail-destroying double resize is EXACT reference behavior
    # (MaskAdapterPooling.forward interpolates the mask to
    # clip_feature.shape[-2:] BEFORE GenerateMaskAdapterMap,
    # mask_adapter.py:57-58 then :152-158) and is required for parity; do
    # not "optimize" it to a single resize.
    mask = resize_bilinear(mask, (H, W)).astype(features.dtype)

    cr = p["channel_reduction"]
    vis = conv2d(cr["conv"], features)
    vis = gelu(layer_norm(cr["norm"], vis, eps=1e-6))

    maps = _generate_mask_adapter_map(p, vis, mask, cfg)  # [B, H, W, M]
    # reference re-resizes maps to the feature grid; same grid here, identity.
    maps = maps.reshape(B, H * W, cfg.num_output_maps)
    # softmax over pixels of logsigmoid(maps) in fp32 (mask_adapter.py:71)
    w = jax.nn.softmax(
        jax.nn.log_sigmoid(maps.astype(jnp.float32)), axis=1
    ).astype(features.dtype)  # [B, P, M]
    pooled = jnp.einsum(
        "bpm,bpc->bmc",
        w,
        features.reshape(B, H * W, C),
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)  # [B, M, C]
    return jnp.mean(pooled, axis=1, keepdims=True)  # [B, 1, C]
