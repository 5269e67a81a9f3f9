"""CORE composite model: one jitted graph from pixels to mask logits.

Parity with the reference's CirSegModelWithQuerySupportFeat
(reference: lib/sam_with_sup_branch.py:19-104) and its factory
build_model_with_query_support_feat (reference: lib/build_model.py:14-122):

forward(query_img, support_img, text, support_mask) ->
  (final_masks [B, 1, 256, 256] logits,
   query_image_embeddings [B, 64, 64, 256] NHWC,
   comb_support_feat [B, 1, 256])

With multimask_output the best mask is chosen by argmax of the IoU head —
kept inside the compiled graph via take_along_axis.

Freezing (reference: lib/build_model.py:112-120): SigLIP towers, the whole
image encoder, and the IoU prediction head are frozen; here that is realized
as (a) stop_gradient at the frozen-tower boundaries so XLA never builds their
backward, and (b) an optax.masked zero-update partition over the param tree
(cor_tpu.train.optim.trainable_mask).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cor_tpu.models.prompt_encoder import (
    PromptEncoderConfig,
    get_dense_pe,
    init_prompt_encoder,
    prompt_encoder_dense,
)
from cor_tpu.models.sam_decoder import (
    MaskDecoderConfig,
    init_mask_decoder,
    mask_decoder,
)
from cor_tpu.models.sam_encoder import (
    SamEncoderConfig,
    init_sam_encoder,
    sam_encoder,
    sam_encoder_config,
)
from cor_tpu.models.support_branch import (
    SupportBranchConfig,
    init_support_branch,
    support_branch,
)
from cor_tpu.ops.common import Params

# SAM pixel statistics (reference: sam_with_sup_branch.py:30-31), exposed for
# the data pipeline; the model itself consumes pre-normalized pixels, matching
# the reference's torchvision-normalized loader (dataloader.py:98-104).
SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0  # logits split point (reference: sam_with_sup_branch.py:20)


@dataclass(frozen=True)
class CoreConfig:
    sam_model: str = "sam_base"
    siglip_model: str = "ViT-B-16-SigLIP-384"
    mask_pooling: str = "MaskAdapterPooling"
    fusion: str = "combiner"
    multimask_output: bool = False
    compute_dtype: str = "bfloat16"
    # reference freezing (SigLIP + image encoder + IoU head,
    # lib/build_model.py:112-120) as param-level stop_gradient. False = full
    # fine-tune: every tower receives gradients — possible because the fused
    # Pallas kernels carry XLA-oracle custom_vjps (cor_tpu.ops.diff). Pair
    # with make_optimizer(freeze_towers=False). The PE gaussian matrix stays
    # frozen either way (a buffer in the reference, never optimized).
    freeze_towers: bool = True
    # explicit sub-config overrides (None -> derive from the names above);
    # used by tests and scaled-down experiments
    encoder_override: Optional[SamEncoderConfig] = None
    decoder_override: Optional[MaskDecoderConfig] = None
    prompt_override: Optional[PromptEncoderConfig] = None
    support_override: Optional[SupportBranchConfig] = None

    @property
    def encoder(self) -> SamEncoderConfig:
        return self.encoder_override or sam_encoder_config(self.sam_model)

    @property
    def decoder(self) -> MaskDecoderConfig:
        return self.decoder_override or MaskDecoderConfig()

    @property
    def prompt(self) -> PromptEncoderConfig:
        if self.prompt_override is not None:
            return self.prompt_override
        g = self.encoder.grid
        return PromptEncoderConfig(
            image_embedding_size=(g, g),
            input_image_size=(self.encoder.img_size, self.encoder.img_size),
        )

    @property
    def support(self) -> SupportBranchConfig:
        if self.support_override is not None:
            if not self.freeze_towers and self.support_override.freeze_siglip:
                from dataclasses import replace

                return replace(self.support_override, freeze_siglip=False)
            return self.support_override
        return SupportBranchConfig(
            siglip_model=self.siglip_model,
            mask_pooling=self.mask_pooling,
            fusion=self.fusion,
            freeze_siglip=self.freeze_towers,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def init_core_model(key: jax.Array, cfg: CoreConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "image_encoder": init_sam_encoder(k1, cfg.encoder),
        "support_branch": init_support_branch(k2, cfg.support),
        "prompt_encoder": init_prompt_encoder(k3, cfg.prompt),
        "mask_decoder": init_mask_decoder(k4, cfg.decoder),
    }


def _cast(params: Params, dtype) -> Params:
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )


def core_forward(
    params: Params,
    query_images: jax.Array,  # [B, 1024, 1024, 3] normalized
    support_images: jax.Array,  # [B, 384, 384, 3] normalized
    text_tokens: jax.Array,  # [B, 64] int32
    support_masks: jax.Array,  # [B, 384, 384, 1] in [0, 1]
    cfg: CoreConfig,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full CORE forward. Computes in cfg.compute_dtype (bf16 by default —
    the reference trains under accelerate bf16 autocast, a_cfg.yaml), with
    fp32 statistics inside norms/softmax and fp32 loss-facing outputs.
    """
    cdt = cfg.dtype
    p = _cast(params, cdt)
    # stop-gradient the FROZEN param subtrees (not just their outputs):
    # leaves with tangents force JAX to linearize every op they touch, which
    # (a) builds dead backward graphs and (b) breaks on forward-only Pallas
    # kernels inside the frozen towers. With param-level stop_gradient those
    # subgraphs are primal-only.
    p = dict(p)
    if cfg.freeze_towers:
        p["image_encoder"] = jax.tree.map(jax.lax.stop_gradient, p["image_encoder"])
        sb = dict(p["support_branch"])
        sb["siglip"] = jax.tree.map(jax.lax.stop_gradient, sb["siglip"])
        p["support_branch"] = sb
    # the PE gaussian matrix is a buffer in the reference, never optimized
    # (my_prompt_encoder.py:186-188); only no_mask_embed trains
    pe = dict(p["prompt_encoder"])
    pe["pe_layer"] = jax.tree.map(jax.lax.stop_gradient, pe["pe_layer"])
    p["prompt_encoder"] = pe

    q = query_images.astype(cdt)
    s = support_images.astype(cdt)
    m = support_masks.astype(cdt)

    # frozen encoder: stop_gradient so the backward pass is never built
    query_embeddings = sam_encoder(p["image_encoder"], q, cfg.encoder)
    if cfg.freeze_towers:
        query_embeddings = jax.lax.stop_gradient(query_embeddings)  # [B, 64, 64, 256]

    comb_support_feat = support_branch(
        p["support_branch"], s, text_tokens, m, cfg.support, key=key, train=train
    )  # [B, 1, 256]

    B = q.shape[0]
    dense_embeddings = prompt_encoder_dense(p["prompt_encoder"], B, cfg.prompt).astype(cdt)
    image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cdt)

    low_res_masks, iou_pred, _ = mask_decoder(
        p["mask_decoder"],
        query_embeddings,
        image_pe,
        comb_support_feat.astype(cdt),
        dense_embeddings,
        cfg.decoder,
        multimask_output=cfg.multimask_output,
        # Pallas-fused decoder tail on inference paths; training keeps the
        # differentiable XLA composition (numerically identical — tested)
        fused=not train,
    )  # [B, C, 256, 256], [B, C]

    if cfg.multimask_output:
        best = jnp.argmax(iou_pred, axis=1)  # [B]
        final = jnp.take_along_axis(low_res_masks, best[:, None, None, None], axis=1)
    else:
        final = low_res_masks  # [B, 1, 256, 256]

    return (
        final.astype(jnp.float32),
        query_embeddings.astype(jnp.float32),
        comb_support_feat.astype(jnp.float32),
    )
