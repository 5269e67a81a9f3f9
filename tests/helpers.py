"""Shared tiny model configs for fast CPU tests."""

from cor_tpu.models.core_model import CoreConfig
from cor_tpu.models.pooling import MaskAdapterConfig
from cor_tpu.models.prompt_encoder import PromptEncoderConfig
from cor_tpu.models.sam_decoder import MaskDecoderConfig, TwoWayTransformerConfig
from cor_tpu.models.sam_encoder import SamEncoderConfig
from cor_tpu.models.siglip import SigLIPConfig, SigLIPTextConfig, SigLIPVisionConfig
from cor_tpu.models.support_branch import SupportBranchConfig

TINY_ENCODER = SamEncoderConfig(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=2,
    num_heads=2,
    out_chans=16,
    window_size=2,
    global_attn_indexes=(1,),
)

TINY_DECODER = MaskDecoderConfig(
    transformer_dim=16,
    iou_head_hidden_dim=16,
    transformer=TwoWayTransformerConfig(depth=2, embedding_dim=16, num_heads=2, mlp_dim=32),
)

TINY_SIGLIP = SigLIPConfig(
    vision=SigLIPVisionConfig(image_size=32, patch_size=16, width=32, depth=2, num_heads=2),
    text=SigLIPTextConfig(context_length=8, vocab_size=64, width=32, depth=2, num_heads=2),
)

TINY_ADAPTER = MaskAdapterConfig(
    x_in_channel=32,
    adapter_in_channel=16,
    mask_downscaling_mid_channel=8,
    adapter_mid_channel=16,
    num_output_maps=4,
)

TINY_SUPPORT = SupportBranchConfig(
    prompt_dim=16,
    proj_hidden=24,
    siglip_override=TINY_SIGLIP,
    adapter_override=TINY_ADAPTER,
)

TINY_PROMPT = PromptEncoderConfig(
    embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64)
)


def tiny_core_config(**kw) -> CoreConfig:
    defaults = dict(
        compute_dtype="float32",
        encoder_override=TINY_ENCODER,
        decoder_override=TINY_DECODER,
        prompt_override=TINY_PROMPT,
        support_override=TINY_SUPPORT,
    )
    defaults.update(kw)
    return CoreConfig(**defaults)


def tiny_batch(rng, batch=2):
    """Synthetic (query, support, text, support_mask, query_mask) batch."""
    import numpy as np

    return {
        "query_img": rng.standard_normal((batch, 64, 64, 3), dtype=np.float32),
        "support_img": rng.standard_normal((batch, 32, 32, 3), dtype=np.float32),
        "text": rng.integers(0, 64, (batch, 8)).astype(np.int32),
        "support_mask": (rng.random((batch, 32, 32, 1)) > 0.5).astype(np.float32),
        "query_mask": (rng.random((batch, 64, 64, 1)) > 0.5).astype(np.float32),
    }
