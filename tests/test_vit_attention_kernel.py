"""attention_2d_fused (Pallas rel-pos kernel) vs the XLA attention_2d oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.ops.attention import attention_2d, attention_2d_fused, init_attention_2d


def test_fused_vit_attention_matches_xla(key, rng):
    # C=256 (two 128-lane pairs), 4 heads of 64 — kernel-eligible shape
    H = W = 8
    C, heads = 256, 4
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(H, W))
    # non-zero rel tables so the bias path is actually exercised
    p["rel_pos_h"] = jnp.asarray(rng.standard_normal((2 * H - 1, C // heads)).astype(np.float32) * 0.3)
    p["rel_pos_w"] = jnp.asarray(rng.standard_normal((2 * W - 1, C // heads)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32) * 0.5)

    ref = attention_2d(p, x, heads)
    out = attention_2d_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_vit_attention_windowed_matches_partitioned_xla(key, rng):
    """window= path (partition fused into the kernel's block indexing) vs
    the explicit partition -> attention_2d -> unpartition oracle, including
    the pad path (H=W=10, window 4 -> padded 12)."""
    from cor_tpu.ops.attention import window_partition, window_unpartition

    H = W = 10
    C, heads, window = 256, 4, 4
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(window, window))
    p["rel_pos_h"] = jnp.asarray(
        rng.standard_normal((2 * window - 1, C // heads)).astype(np.float32) * 0.3
    )
    p["rel_pos_w"] = jnp.asarray(
        rng.standard_normal((2 * window - 1, C // heads)).astype(np.float32) * 0.3
    )
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32) * 0.5)

    xw, pad_hw = window_partition(x, window)
    ref = window_unpartition(attention_2d(p, xw, heads), window, pad_hw, (H, W))
    out = attention_2d_fused(p, x, heads, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_vit_attention_windowed_exact_tiling(key, rng):
    # H % window == 0: no pad/crop on either path
    H = W = 8
    C, heads, window = 128, 2, 4
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(window, window))
    p["rel_pos_h"] = jnp.asarray(
        rng.standard_normal((2 * window - 1, C // heads)).astype(np.float32) * 0.3
    )
    p["rel_pos_w"] = jnp.asarray(
        rng.standard_normal((2 * window - 1, C // heads)).astype(np.float32) * 0.3
    )
    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32) * 0.5)

    from cor_tpu.ops.attention import window_partition, window_unpartition

    xw, pad_hw = window_partition(x, window)
    ref = window_unpartition(attention_2d(p, xw, heads), window, pad_hw, (H, W))
    out = attention_2d_fused(p, x, heads, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_encoder_fused_window_indexing_flag_parity(key, rng):
    """The opt-in fused_window_indexing encoder path (window partition folded
    into the kernel's block index maps) matches the default partitioned path."""
    from dataclasses import replace

    from cor_tpu.models.sam_encoder import SamEncoderConfig, init_sam_encoder, sam_encoder

    cfg = SamEncoderConfig(
        img_size=160, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        out_chans=32, window_size=4, global_attn_indexes=(1,),
    )
    p = init_sam_encoder(key, cfg)
    # non-trivial rel tables + pos embed so every bias path is exercised
    for blk in p["blocks"]:
        for k in ("rel_pos_h", "rel_pos_w"):
            blk["attn"][k] = jnp.asarray(
                rng.standard_normal(blk["attn"][k].shape).astype(np.float32) * 0.3
            )
    x = jnp.asarray(rng.standard_normal((1, 160, 160, 3)).astype(np.float32))
    ref = sam_encoder(p, x, cfg)
    out = sam_encoder(p, x, replace(cfg, fused_window_indexing=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4, rtol=3e-4)


def test_fused_vit_attention_lane_padded_heads(key, rng):
    """head_dim 80 (sam_huge: 128 % 80 != 0) engages the lane-pad shim —
    each head zero-padded to 128 lanes with the TRUE 1/sqrt(80) scale passed
    explicitly — instead of falling back to XLA. Forward AND gradients must
    match the oracle (the pad/crop are linear, so autodiff routes the flash
    backward through them)."""
    H = W = 8
    C, heads = 160, 2  # head_dim 80, exactly sam_huge's
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(H, W))
    p["rel_pos_h"] = jnp.asarray(rng.standard_normal((2 * H - 1, C // heads)).astype(np.float32) * 0.3)
    p["rel_pos_w"] = jnp.asarray(rng.standard_normal((2 * W - 1, C // heads)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32) * 0.5)

    ref = attention_2d(p, x, heads)
    out = attention_2d_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)

    def loss(fn):
        def g(p, x):
            o = fn(p, x, heads)
            return jnp.sum(o * o)
        return jax.grad(g, argnums=(0, 1))(p, x)

    gp_ref, gx_ref = loss(attention_2d)
    gp_out, gx_out = loss(attention_2d_fused)
    np.testing.assert_allclose(np.asarray(gx_out), np.asarray(gx_ref), atol=5e-3, rtol=5e-3)
    for k in ("qkv", "proj"):
        np.testing.assert_allclose(
            np.asarray(gp_out[k]["w"]), np.asarray(gp_ref[k]["w"]), atol=5e-3, rtol=5e-3
        )
    for k in ("rel_pos_h", "rel_pos_w"):
        np.testing.assert_allclose(
            np.asarray(gp_out[k]), np.asarray(gp_ref[k]), atol=5e-3, rtol=5e-3
        )


def test_fused_vit_attention_fallback_small_dims(key, rng):
    # tiny config (C=32) falls back to the XLA path — must still be exact
    H = W = 4
    C, heads = 32, 2
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(H, W))
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    ref = attention_2d(p, x, heads)
    out = attention_2d_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
