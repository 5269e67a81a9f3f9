"""Stock-SAM prompt encoder (points/boxes/masks) — API-completeness parity
with the reference's unused-but-shipped prompt_encoder.py."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.prompt_encoder import (
    PromptEncoderConfig,
    embed_boxes,
    embed_masks,
    embed_points,
    full_prompt_encoder,
    init_full_prompt_encoder,
)

CFG = PromptEncoderConfig(
    embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64), mask_in_chans=8
)


def test_points_and_padding(key, rng):
    params = init_full_prompt_encoder(key, CFG)
    pts = jnp.asarray(rng.uniform(0, 64, (2, 3, 2)).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 0, -1], [1, 1, 0]], np.int32))
    sparse, dense_e = full_prompt_encoder(params, CFG, points=(pts, labels))
    assert sparse.shape == (2, 4, 16)  # 3 points + 1 pad (boxes absent)
    assert dense_e.shape == (2, 4, 4, 16)
    # padded slot equals not_a_point_embed exactly
    nape = np.asarray(params["not_a_point_embed"][0])
    np.testing.assert_allclose(
        np.asarray(sparse)[:, 3, :], np.broadcast_to(nape, (2, 16)), atol=1e-6
    )


def test_boxes(key, rng):
    params = init_full_prompt_encoder(key, CFG)
    boxes = jnp.asarray(rng.uniform(0, 64, (3, 4)).astype(np.float32))
    sparse, _ = full_prompt_encoder(params, CFG, boxes=boxes)
    assert sparse.shape == (3, 2, 16)


def test_masks_dense_path(key, rng):
    params = init_full_prompt_encoder(key, CFG)
    masks = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    sparse, dense_e = full_prompt_encoder(params, CFG, masks=masks, batch=2)
    assert sparse.shape == (2, 0, 16)
    assert dense_e.shape == (2, 4, 4, 16)
    # differs from the no-mask broadcast
    _, dense_nomask = full_prompt_encoder(params, CFG, batch=2)
    assert not np.allclose(np.asarray(dense_e), np.asarray(dense_nomask))


def test_no_prompts_matches_no_mask_embed(key):
    params = init_full_prompt_encoder(key, CFG)
    sparse, dense_e = full_prompt_encoder(params, CFG, batch=2)
    arr = np.asarray(dense_e)
    np.testing.assert_allclose(arr[0, 0, 0], np.asarray(params["no_mask_embed"][0]))
    assert np.allclose(arr, arr[:, :1, :1, :])
