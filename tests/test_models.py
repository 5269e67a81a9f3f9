"""Shape/semantics tests for the model stack + torch-oracle parity for the
numerically tricky pieces (decomposed rel-pos, window partition,
transposed-conv upscaling, mask-adapter pooling weights)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from cor_tpu.models.core_model import core_forward, init_core_model
from cor_tpu.models.pooling import masked_pooling
from cor_tpu.models.prompt_encoder import (
    PromptEncoderConfig,
    get_dense_pe,
    init_prompt_encoder,
    prompt_encoder_dense,
)
from cor_tpu.models.sam_decoder import _conv_transpose_2x
from cor_tpu.models.sam_encoder import init_sam_encoder, sam_encoder
from cor_tpu.models.siglip import init_siglip, siglip_encode
from cor_tpu.models.support_branch import init_support_branch, support_branch
from cor_tpu.ops.attention import (
    decomposed_rel_pos_bias,
    get_rel_pos,
    window_partition,
    window_unpartition,
)
from tests.helpers import (
    TINY_ENCODER,
    TINY_PROMPT,
    TINY_SIGLIP,
    TINY_SUPPORT,
    tiny_batch,
    tiny_core_config,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 4), dtype=np.float32))
    wins, pad_hw = window_partition(x, 3)
    assert wins.shape == (2 * 3 * 3, 3, 3, 4)
    back = window_unpartition(wins, 3, pad_hw, (7, 9))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def _torch_get_rel_pos(q_size, k_size, rel_pos):
    """Independent oracle of reference get_rel_pos (image_encoder.py:293-323)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = tF.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist,
            mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def test_get_rel_pos_matches_torch(rng):
    for L, q in [(2 * 5 - 1, 5), (7, 5), (2 * 14 - 1, 14)]:
        table = rng.standard_normal((L, 8), dtype=np.float32)
        ours = get_rel_pos(q, q, jnp.asarray(table))
        ref = _torch_get_rel_pos(q, q, torch.from_numpy(table))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_decomposed_rel_pos_bias_matches_torch(rng):
    """attn-bias parity with reference add_decomposed_rel_pos (image_encoder.py:326-362)."""
    B, h, w, d = 3, 4, 5, 8
    q = rng.standard_normal((B, h * w, d), dtype=np.float32)
    rel_h = rng.standard_normal((2 * h - 1, d), dtype=np.float32)
    rel_w = rng.standard_normal((2 * w - 1, d), dtype=np.float32)
    attn0 = rng.standard_normal((B, h * w, h * w), dtype=np.float32)

    bh, bw = decomposed_rel_pos_bias(
        jnp.asarray(q), jnp.asarray(rel_h), jnp.asarray(rel_w), (h, w), (h, w)
    )
    ours = (
        jnp.asarray(attn0).reshape(B, h, w, h, w)
        + bh[:, :, :, :, None]
        + bw[:, :, :, None, :]
    ).reshape(B, h * w, h * w)

    # torch oracle
    Rh = _torch_get_rel_pos(h, h, torch.from_numpy(rel_h))
    Rw = _torch_get_rel_pos(w, w, torch.from_numpy(rel_w))
    r_q = torch.from_numpy(q).reshape(B, h, w, d)
    t_rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    t_rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    ref = (
        torch.from_numpy(attn0).view(B, h, w, h, w)
        + t_rel_h[:, :, :, :, None]
        + t_rel_w[:, :, :, None, :]
    ).view(B, h * w, h * w)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_conv_transpose_2x_matches_torch(rng):
    cin, cout = 8, 4
    x = rng.standard_normal((2, 5, 5, cin), dtype=np.float32)
    w = rng.standard_normal((cin, 2, 2, cout), dtype=np.float32)
    b = rng.standard_normal(cout, dtype=np.float32)
    y = _conv_transpose_2x({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    yt = tF.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(0, 3, 1, 2)),  # torch convT weight [I, O, kh, kw]
        torch.from_numpy(b),
        stride=2,
    )
    np.testing.assert_allclose(
        np.asarray(y), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-4
    )


def test_masked_pooling_matches_reference_math(rng):
    feat = rng.standard_normal((2, 6, 6, 16), dtype=np.float32)
    mask = rng.random((2, 12, 12, 1)).astype(np.float32)
    ours = masked_pooling(jnp.asarray(feat), jnp.asarray(mask))
    mt = tF.interpolate(
        torch.from_numpy(mask.transpose(0, 3, 1, 2)), size=(6, 6), mode="bilinear",
        align_corners=False,
    )
    ft = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    ref = (ft * mt).sum((2, 3)) / (mt.sum((2, 3)) + 1e-8)
    np.testing.assert_allclose(
        np.asarray(ours)[:, 0, :], ref.numpy(), atol=1e-5, rtol=1e-4
    )


def test_sam_encoder_shapes(key, rng):
    params = init_sam_encoder(key, TINY_ENCODER)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    y = sam_encoder(params, x, TINY_ENCODER)
    assert y.shape == (2, 4, 4, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_prompt_encoder_shapes(key):
    params = init_prompt_encoder(key, TINY_PROMPT)
    dense_e = prompt_encoder_dense(params, 3, TINY_PROMPT)
    assert dense_e.shape == (3, 4, 4, 16)
    # every spatial position identical (broadcast of no_mask_embed)
    arr = np.asarray(dense_e)
    assert np.allclose(arr, arr[:, :1, :1, :])
    pe = get_dense_pe(params, TINY_PROMPT)
    assert pe.shape == (1, 4, 4, 16)


def test_dense_pe_matches_reference_formula(key):
    """Random-Fourier PE vs direct transcription of my_prompt_encoder.py:191-211."""
    params = init_prompt_encoder(key, TINY_PROMPT)
    g = np.asarray(params["pe_layer"]["gaussian_matrix"])
    h, w = 4, 4
    grid = np.ones((h, w), np.float32)
    y_embed = (grid.cumsum(0) - 0.5) / h
    x_embed = (grid.cumsum(1) - 0.5) / w
    coords = np.stack([x_embed, y_embed], -1)
    c = (2 * coords - 1) @ g * 2 * np.pi
    ref = np.concatenate([np.sin(c), np.cos(c)], -1)
    ours = np.asarray(get_dense_pe(params, TINY_PROMPT))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_siglip_shapes(key, rng):
    params = init_siglip(key, TINY_SIGLIP)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)).astype(np.int32))
    img_f, txt_f, grid = siglip_encode(params, imgs, toks, TINY_SIGLIP)
    assert img_f.shape == (2, 32)
    assert txt_f.shape == (2, 32)
    assert grid.shape == (2, 2, 2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt_f), axis=-1), 1.0, atol=1e-5)


def test_support_branch_shapes(key, rng):
    params = init_support_branch(key, TINY_SUPPORT)
    batch = tiny_batch(rng)
    out = support_branch(
        params,
        jnp.asarray(batch["support_img"]),
        jnp.asarray(batch["text"]),
        jnp.asarray(batch["support_mask"]),
        TINY_SUPPORT,
    )
    assert out.shape == (2, 1, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_core_forward_shapes_and_determinism(key, rng):
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    b = tiny_batch(rng)
    args = (
        jnp.asarray(b["query_img"]),
        jnp.asarray(b["support_img"]),
        jnp.asarray(b["text"]),
        jnp.asarray(b["support_mask"]),
    )
    masks, qemb, sfeat = core_forward(params, *args, cfg)
    assert masks.shape == (2, 1, 16, 16)  # 4x the 4x4 embedding grid
    assert qemb.shape == (2, 4, 4, 16)
    assert sfeat.shape == (2, 1, 16)
    # eval-mode forward is deterministic
    masks2, _, _ = core_forward(params, *args, cfg)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(masks2))


def test_core_forward_multimask(key, rng):
    cfg = tiny_core_config(multimask_output=True)
    params = init_core_model(key, cfg)
    b = tiny_batch(rng)
    masks, _, _ = core_forward(
        params,
        jnp.asarray(b["query_img"]),
        jnp.asarray(b["support_img"]),
        jnp.asarray(b["text"]),
        jnp.asarray(b["support_mask"]),
        cfg,
    )
    assert masks.shape == (2, 1, 16, 16)


def test_core_forward_dropout_active_in_train(key, rng):
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    b = tiny_batch(rng)
    args = (
        jnp.asarray(b["query_img"]),
        jnp.asarray(b["support_img"]),
        jnp.asarray(b["text"]),
        jnp.asarray(b["support_mask"]),
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    m1, _, _ = core_forward(params, *args, cfg, key=k1, train=True)
    m2, _, _ = core_forward(params, *args, cfg, key=k2, train=True)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_size_tables_match_reference():
    """Model-size tables pin the reference's exact variants
    (build_model.py:31-49; support_branch.py:19-26)."""
    from cor_tpu.models.sam_encoder import SAM_SIZES
    from cor_tpu.models.siglip import SIGLIP_MODELS, siglip_dim

    assert SAM_SIZES["sam_base"] == dict(
        embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11))
    assert SAM_SIZES["sam_large"] == dict(
        embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23))
    assert SAM_SIZES["sam_huge"] == dict(
        embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31))

    # siglip_dim selection (reference: support_branch.py:19-26)
    assert siglip_dim("ViT-SO400M-14-SigLIP-384") == 1152
    assert siglip_dim("ViT-B-16-SigLIP-384") == 768
    assert siglip_dim("ViT-L-16-SigLIP-384") == 1024
    with pytest.raises(ValueError):
        siglip_dim("not-a-model")
    # SO400M geometry: stride-14 VALID conv -> 27x27 grid (siglip_openclip.py:93-111)
    assert SIGLIP_MODELS["ViT-SO400M-14-SigLIP-384"].vision.grid == 27
    assert SIGLIP_MODELS["ViT-B-16-SigLIP-384"].vision.grid == 24
