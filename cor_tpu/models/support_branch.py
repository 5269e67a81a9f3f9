"""Support branch: (support image, change text, support mask) -> one 256-d
sparse prompt token for the mask decoder.

Parity with the reference's SupportBranch (reference: lib/support_branch.py:13-87):
SigLIP(sup_img, text) -> LN on the patch grid -> mask pooling -> LN ->
CirFuse.compose_img_text -> dim_proj (Linear D->512, GELU, Dropout 0.8,
Linear 512->256, GELU, Dropout 0.8) -> L2 normalize -> [N, 1, 256].

The fusion strategy is configurable, covering the reference's commented
ablation variants (support_branch.py:64-82).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax

from cor_tpu.models.fusion import cir_fuse_compose, init_cir_fuse
from cor_tpu.models.pooling import (
    MaskAdapterConfig,
    init_mask_adapter_pooling,
    mask_adapter_pooling,
    masked_pooling,
)
from cor_tpu.models.siglip import SIGLIP_MODELS, SigLIPConfig, init_siglip, siglip_encode
from cor_tpu.ops.common import (
    Params,
    dense,
    dropout,
    gelu,
    init_dense,
    init_layer_norm,
    layer_norm,
    l2_normalize,
)


@dataclass(frozen=True)
class SupportBranchConfig:
    siglip_model: str = "ViT-B-16-SigLIP-384"
    mask_pooling: str = "MaskAdapterPooling"  # or "MaskedPooling"
    fusion: str = "combiner"  # combiner | add | image_only | no_mask | global_image | text_only
    prompt_dim: int = 256
    proj_hidden: int = 512
    proj_dropout: float = 0.8
    # cut gradients at the SigLIP boundary (the reference runs the tower
    # under @torch.no_grad, siglip_openclip.py:22,46). False = the tower
    # trains (full fine-tune; see CoreConfig.freeze_towers)
    freeze_siglip: bool = True
    siglip_override: Optional[SigLIPConfig] = None  # tests / scaled-down runs
    adapter_override: Optional[MaskAdapterConfig] = None

    @property
    def siglip(self) -> SigLIPConfig:
        if self.siglip_override is not None:
            return self.siglip_override
        if self.siglip_model not in SIGLIP_MODELS:
            raise ValueError(f"Invalid SigLIP model: {self.siglip_model}")
        return SIGLIP_MODELS[self.siglip_model]

    @property
    def siglip_dim(self) -> int:
        return self.siglip.embed_dim

    @property
    def adapter(self) -> MaskAdapterConfig:
        if self.adapter_override is not None:
            return self.adapter_override
        # reference instantiation: support_branch.py:30-36
        return MaskAdapterConfig(
            x_in_channel=self.siglip_dim,
            adapter_in_channel=512,
            mask_downscaling_mid_channel=16,
            adapter_mid_channel=256,
            num_output_maps=8,
        )


def init_support_branch(key: jax.Array, cfg: SupportBranchConfig) -> Params:
    keys = jax.random.split(key, 6)
    d = cfg.siglip_dim
    p: Params = {
        "siglip": init_siglip(keys[0], cfg.siglip),
        "cir_fuse": init_cir_fuse(keys[1], d, d),
        "ln_channel_first": init_layer_norm(d),
        "ln_channel_last": init_layer_norm(d),
        "dim_proj": {
            "lin1": init_dense(keys[2], d, cfg.proj_hidden),
            "lin2": init_dense(keys[3], cfg.proj_hidden, cfg.prompt_dim),
        },
    }
    if cfg.mask_pooling == "MaskAdapterPooling":
        p["mask_pooling"] = init_mask_adapter_pooling(keys[4], cfg.adapter)
    elif cfg.mask_pooling != "MaskedPooling":
        raise ValueError(f"Invalid mask pooling method: {cfg.mask_pooling}")
    return p


def support_branch(
    p: Params,
    support_images: jax.Array,  # [B, S, S, 3]
    text_tokens: jax.Array,  # [B, L] int32
    support_masks: jax.Array,  # [B, S, S, 1]
    cfg: SupportBranchConfig,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Returns the sparse prompt token [B, 1, prompt_dim] (L2-normed)."""
    if key is not None:
        k_fuse, k_d1, k_d2 = jax.random.split(key, 3)
    else:
        k_fuse = k_d1 = k_d2 = None

    image_feat, text_feat, grid = siglip_encode(
        p["siglip"], support_images, text_tokens, cfg.siglip
    )
    # SigLIP is frozen; cut gradients at the tower boundary
    # (reference runs it under @torch.no_grad — siglip_openclip.py:22,46)
    if cfg.freeze_siglip:
        image_feat = jax.lax.stop_gradient(image_feat)
        text_feat = jax.lax.stop_gradient(text_feat)
        grid = jax.lax.stop_gradient(grid)

    grid = layer_norm(p["ln_channel_first"], grid, eps=1e-6)
    if cfg.mask_pooling == "MaskAdapterPooling":
        support_feat = mask_adapter_pooling(p["mask_pooling"], grid, support_masks, cfg.adapter)
    else:
        support_feat = masked_pooling(grid, support_masks)
    support_feat = layer_norm(p["ln_channel_last"], support_feat, eps=1e-6)
    support_feat = support_feat[:, 0, :]  # [B, D]

    if cfg.fusion == "combiner":
        fused = cir_fuse_compose(p["cir_fuse"], support_feat, text_feat, k_fuse, train)["repres"]
    elif cfg.fusion == "add":  # ablation: direct add (support_branch.py:69)
        fused = support_feat + text_feat
    elif cfg.fusion == "image_only":  # remove text branch (:72)
        fused = support_feat
    elif cfg.fusion == "no_mask":  # remove mask branch (:75-76)
        fused = cir_fuse_compose(p["cir_fuse"], image_feat, text_feat, k_fuse, train)["repres"]
    elif cfg.fusion == "global_image":  # only global image feature (:79)
        fused = image_feat
    elif cfg.fusion == "text_only":  # only text feature (:82)
        fused = text_feat
    else:
        raise ValueError(f"Invalid fusion: {cfg.fusion}")

    # dim_proj: Linear -> GELU -> Dropout(0.8) -> Linear -> GELU -> Dropout(0.8)
    x = gelu(dense(p["dim_proj"]["lin1"], fused))
    x = dropout(x, cfg.proj_dropout, k_d1, train)
    x = gelu(dense(p["dim_proj"]["lin2"], x))
    x = dropout(x, cfg.proj_dropout, k_d2, train)

    return l2_normalize(x)[:, None, :]  # [B, 1, prompt_dim]
