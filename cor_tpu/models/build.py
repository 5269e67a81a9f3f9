"""Model factory with the reference's public signature.

Parity with build_model_with_query_support_feat
(reference: lib/build_model.py:14-122): size-table lookup, checkpoint surgery
(image_encoder.* + mask_decoder.* only; prompt-encoder `no_mask_embed` stays
randomly initialized), SigLIP weight loading, and the freezing contract
(realized as the optax mask partition + param-level stop_gradient rather than
requires_grad mutation — see cor_tpu.train.optim.trainable_mask).

Returns (params, CoreConfig) — the functional equivalents of the reference's
configured nn.Module.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from cor_tpu.models.core_model import CoreConfig, init_core_model
from cor_tpu.ops.common import Params


def build_model_with_query_support_feat(
    sam_model: str = "sam_base",
    siglip_model: str = "ViT-SO400M-14-SigLIP-384",
    sam_checkpoint_path: Optional[str] = None,
    siglip_checkpoint_path: Optional[str] = None,
    mask_pooling: str = "MaskedPooling",
    multimask_output: bool = False,
    compute_dtype: str = "bfloat16",
    seed: int = 0,
) -> Tuple[Params, CoreConfig]:
    cfg = CoreConfig(
        sam_model=sam_model,
        siglip_model=siglip_model,
        mask_pooling=mask_pooling,
        multimask_output=multimask_output,
        compute_dtype=compute_dtype,
    )
    params = init_core_model(jax.random.PRNGKey(seed), cfg)

    if sam_checkpoint_path:
        from cor_tpu.utils.convert import load_sam_weights

        params = load_sam_weights(params, sam_checkpoint_path, cfg.encoder.depth)
    if siglip_checkpoint_path:
        from cor_tpu.utils.convert import load_siglip_weights

        sig = cfg.support.siglip
        params = load_siglip_weights(
            params, siglip_checkpoint_path, sig.vision.depth, sig.text.depth
        )
    return params, cfg
