"""SigLIP tower parity against HF transformers' SiglipModel (trusted oracle).

The reference wraps open_clip (unavailable offline), but ships an equivalent
HF-transformers alternative (reference: lib/support_model/siglip_hugginface.py)
— the same towers in the HF dialect. transformers IS installed, so a
randomly-initialized tiny SiglipModel checks BOTH:
- the convert_siglip_hf dialect mapping, and
- our tower math (patch embed, pre-LN blocks, MAP pooling head, last-token
  text pooling + projection head).

hidden_act="gelu": open_clip/timm towers (the dialect CORE trains with) use
exact GELU; HF's default tanh approximation is a config choice, not an
architecture difference.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cor_tpu.models.siglip import (
    SigLIPConfig,
    SigLIPTextConfig,
    SigLIPVisionConfig,
    siglip_text,
    siglip_vision,
)
from cor_tpu.utils.convert import convert_siglip_hf

TOL = 1e-4

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(11)
    cfg = transformers.SiglipConfig(
        vision_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16, hidden_act="gelu",
        ),
        text_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=8, vocab_size=64,
            hidden_act="gelu",
        ),
    )
    return transformers.SiglipModel(cfg).eval()


@pytest.fixture(scope="module")
def converted(hf_model):
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}
    params = convert_siglip_hf(sd, vision_depth=2, text_depth=2)
    return jax.tree.map(jnp.asarray, params)


V_CFG = SigLIPVisionConfig(image_size=32, patch_size=16, width=64, depth=2, num_heads=2, mlp_ratio=2.0)
T_CFG = SigLIPTextConfig(context_length=8, vocab_size=64, width=64, depth=2, num_heads=2, mlp_ratio=2.0)


def test_vision_tower_matches_hf(hf_model, converted):
    rng = np.random.default_rng(11)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf_model.vision_model(pixel_values=torch.from_numpy(imgs))
    pooled, grid = siglip_vision(
        converted["visual"], jnp.asarray(imgs.transpose(0, 2, 3, 1)), V_CFG
    )
    want_tokens = out.last_hidden_state.numpy()  # [B, N, D] post post_layernorm
    got_tokens = np.asarray(grid).reshape(want_tokens.shape)
    assert float(np.abs(want_tokens - got_tokens).max()) < TOL
    assert float(np.abs(out.pooler_output.numpy() - np.asarray(pooled)).max()) < TOL


def test_text_tower_matches_hf(hf_model, converted):
    rng = np.random.default_rng(12)
    ids = rng.integers(0, 64, (2, 8)).astype(np.int64)
    with torch.no_grad():
        out = hf_model.text_model(input_ids=torch.from_numpy(ids))
    got = siglip_text(converted["text"], jnp.asarray(ids.astype(np.int32)), T_CFG)
    assert float(np.abs(out.pooler_output.numpy() - np.asarray(got)).max()) < TOL
