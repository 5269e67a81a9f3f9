"""two_way_layer_fused kernel vs the XLA _two_way_block (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cor_tpu.models.sam_decoder import (
    TwoWayTransformerConfig,
    _matmul_nobias,
    _two_way_block,
    init_two_way_transformer,
    two_way_transformer,
)
import cor_tpu.ops.pallas.two_way_layer as twl


@pytest.fixture(scope="module")
def full_size_layer():
    cfg = TwoWayTransformerConfig(depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048)
    return cfg, init_two_way_transformer(jax.random.PRNGKey(0), cfg)


@pytest.mark.parametrize("skip_pe", [True, False])
def test_two_way_layer_fused_matches_block(full_size_layer, rng, skip_pe):
    cfg, p = full_size_layer
    lp = p["layers"][0]
    B, N, C = 1, twl._TILE * 2, 256

    keys = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)
    key_pe = jnp.asarray(rng.standard_normal((1, N, C)).astype(np.float32) * 0.5)
    kpe = _matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0]
    qpe_img = _matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0]

    q_ref, k_ref = _two_way_block(
        lp, tokens, keys, tokens, key_pe, cfg.num_heads,
        skip_first_layer_pe=skip_pe, fused=False,
    )
    q_f, k_f = twl.two_way_layer_fused(
        lp, tokens, tokens, keys, kpe, qpe_img, cfg.num_heads, skip_pe=skip_pe
    )
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_ref), atol=2e-4, rtol=2e-4)


def test_two_way_transformer_layer_fused_path(full_size_layer, rng):
    """The full transformer with fused=True (layer-fused path engaged at this
    geometry) matches the unfused XLA composition."""
    cfg, p = full_size_layer
    B, g, C = 1, 32, 256  # 32*32 = 1024 rows = one row tile

    img = jnp.asarray(rng.standard_normal((B, g, g, C)).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.standard_normal((1, g, g, C)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)

    hs_ref, src_ref = two_way_transformer(p, img, pe, tokens, cfg, fused=False)
    hs_f, src_f = two_way_transformer(p, img, pe, tokens, cfg, fused=True)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(hs_ref), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(src_f), np.asarray(src_ref), atol=5e-4, rtol=5e-4)


def test_store_indexed_decode_matches_gather(full_size_layer, rng):
    """mask_decoder(store, store_idx=...) == gather-then-decode: the
    scalar-prefetch block indexing in the first fused layer reads
    store[idx[b]] directly."""
    from cor_tpu.models.sam_decoder import MaskDecoderConfig, init_mask_decoder, mask_decoder

    cfg = MaskDecoderConfig(
        transformer_dim=256,
        iou_head_hidden_dim=256,
        transformer=TwoWayTransformerConfig(depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048),
    )
    p = init_mask_decoder(jax.random.PRNGKey(1), cfg)
    g = 32  # 32*32 = 1024 rows = one row tile
    store = jnp.asarray(rng.standard_normal((3, g, g, 256)).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.standard_normal((1, g, g, 256)).astype(np.float32) * 0.3)
    prompts = jnp.asarray(rng.standard_normal((2, 1, 256)).astype(np.float32) * 0.5)
    idx = jnp.asarray(np.array([2, 0], np.int32))

    m_ref, iou_ref, _ = mask_decoder(
        p, store[idx], pe, prompts, None, cfg, multimask_output=False, fused=True
    )
    m_idx, iou_idx, _ = mask_decoder(
        p, store, pe, prompts, None, cfg, multimask_output=False, fused=True, store_idx=idx
    )
    np.testing.assert_allclose(np.asarray(m_idx), np.asarray(m_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(iou_idx), np.asarray(iou_ref), atol=2e-4, rtol=2e-4)


def test_int8_store_decode_matches_dequantized(full_size_layer, rng):
    """mask_decoder(int8 store, store_scale=...) == decoding the XLA-side
    dequantized store: the first fused layer's in-VMEM dequant (fp32 scale
    multiply after the 4x-smaller int8 DMA) is bit-equivalent to
    materializing store[s] * scale[s] up front."""
    from cor_tpu.models.sam_decoder import MaskDecoderConfig, init_mask_decoder, mask_decoder
    from cor_tpu.retrieval.engine import quantize_candidate_store

    cfg = MaskDecoderConfig(
        transformer_dim=256,
        iou_head_hidden_dim=256,
        transformer=TwoWayTransformerConfig(depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048),
    )
    p = init_mask_decoder(jax.random.PRNGKey(1), cfg)
    g = 32  # 32*32 = 1024 rows = one row tile
    store = jnp.asarray(rng.standard_normal((3, g, g, 256)).astype(np.float32) * 0.3)
    no_mask = jnp.asarray(rng.standard_normal((256,)).astype(np.float32) * 0.1)
    pe = jnp.asarray(rng.standard_normal((1, g, g, 256)).astype(np.float32) * 0.3)
    prompts = jnp.asarray(rng.standard_normal((2, 1, 256)).astype(np.float32) * 0.5)
    idx = jnp.asarray(np.array([2, 0], np.int32))

    store_q, scales = quantize_candidate_store(store, no_mask_embed=no_mask)
    assert store_q.dtype == jnp.int8 and scales.shape == (3,)
    store_deq = store_q.astype(jnp.float32) * scales[:, None, None, None]

    m_ref, iou_ref, _ = mask_decoder(
        p, store_deq, pe, prompts, None, cfg, multimask_output=False,
        fused=True, store_idx=idx,
    )
    m_q, iou_q, _ = mask_decoder(
        p, store_q, pe, prompts, None, cfg, multimask_output=False,
        fused=True, store_idx=idx, store_scale=scales,
    )
    np.testing.assert_allclose(np.asarray(m_q), np.asarray(m_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(iou_q), np.asarray(iou_ref), atol=2e-4, rtol=2e-4)

    # the pre-baked no-mask prompt + quantization stay close to the exact
    # bf16-style store: logits differ only by the int8 rounding (~scale/2)
    m_exact, _, _ = mask_decoder(
        p, store + no_mask[None, None, None, :], pe, prompts, None, cfg,
        multimask_output=False, fused=True, store_idx=idx,
    )
    err = np.abs(np.asarray(m_q) - np.asarray(m_exact)).max()
    assert err < 0.15, f"int8 store decode drifted too far from exact: {err}"

    # non-fused gather fallback takes the same (store_idx, store_scale) API
    m_nf, _, _ = mask_decoder(
        p, store_q, pe, prompts, None, cfg, multimask_output=False,
        fused=False, store_idx=idx, store_scale=scales,
    )
    np.testing.assert_allclose(np.asarray(m_nf), np.asarray(m_ref), atol=5e-4, rtol=5e-4)


def test_two_way_layer_fused_candidate_grouping(full_size_layer, rng):
    """B=8 engages the G=4 candidate-grouping path (grid B/G): the batched
    token stages and the block-diagonal cross-candidate masking must be
    exactly per-candidate — every candidate's outputs match a B=1 run of the
    same kernel on its own (distinct) keys/tokens."""
    cfg, p = full_size_layer
    lp = p["layers"][0]
    B, N, C = 8, twl._TILE, 256

    keys = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)
    key_pe = jnp.asarray(rng.standard_normal((1, N, C)).astype(np.float32) * 0.5)
    kpe = _matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0]
    qpe_img = _matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0]

    q_g, k_g = twl.two_way_layer_fused(
        lp, tokens, tokens, keys, kpe, qpe_img, cfg.num_heads, skip_pe=False
    )
    for b in (0, 3, 7):  # first/mid/last positions within and across groups
        q_1, k_1 = twl.two_way_layer_fused(
            lp, tokens[b : b + 1], tokens[b : b + 1], keys[b : b + 1],
            kpe, qpe_img, cfg.num_heads, skip_pe=False,
        )
        np.testing.assert_allclose(
            np.asarray(q_g[b : b + 1]), np.asarray(q_1), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(k_g[b : b + 1]), np.asarray(k_1), atol=2e-4, rtol=2e-4
        )

    # store-indexed variant at the same G: permuted gather through the group
    idx = jnp.asarray(np.array([5, 2, 7, 0, 1, 6, 3, 4], np.int32))
    q_s, k_s = twl.two_way_layer_fused(
        lp, tokens[idx], tokens[idx], keys, kpe, qpe_img, cfg.num_heads,
        skip_pe=False, keys_idx=idx,
    )
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_g[idx]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_g[idx]), atol=2e-4, rtol=2e-4)


def test_two_way_layer_fused_per_head_softmax_stability(full_size_layer, rng):
    """The i2t softmax shift must be PER HEAD (round-2 advice): with a
    global max, a head whose entire logit block sits ~88+ below another
    head's max underflows to exp()==0 across the block, zeroing its
    normalizer and emitting NaN. Shift head 0's i2t key-projection BIAS by
    +400: every key of head 0 moves by the same vector, so each image row's
    head-0 logits shift uniformly by q_row . b — hundreds above (or below)
    every other head's logits, while every head's INTERNAL logit range
    stays O(1) (the realistic regime: cross-head spread large, within-head
    range small). Check fused == unfused, NaN-free."""
    cfg, p = full_size_layer
    lp = jax.tree.map(jnp.array, p["layers"][0])  # deep copy
    head_dim = (cfg.embedding_dim // 2) // cfg.num_heads  # downsample rate 2
    b = np.array(lp["cross_attn_i2t"]["k_proj"]["b"])
    b[:head_dim] += 400.0
    lp["cross_attn_i2t"]["k_proj"]["b"] = jnp.asarray(b)

    B, N, C = 1, twl._TILE * 2, 256
    keys = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)
    key_pe = jnp.asarray(rng.standard_normal((1, N, C)).astype(np.float32) * 0.5)
    kpe = _matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0]
    qpe_img = _matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0]

    q_ref, k_ref = _two_way_block(
        lp, tokens, keys, tokens, key_pe, cfg.num_heads,
        skip_first_layer_pe=True, fused=False,
    )
    q_f, k_f = twl.two_way_layer_fused(
        lp, tokens, tokens, keys, kpe, qpe_img, cfg.num_heads, skip_pe=True
    )
    assert np.isfinite(np.asarray(k_f)).all()
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_ref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_ref), atol=3e-4, rtol=3e-4)


def test_two_way_grid_fused_matches_composition(full_size_layer, rng, monkeypatch):
    """The layer-as-grid-dimension kernel (grid (B/G, 2), pl.when-selected
    single-layer body, keys once in/once out through the revisited output
    block) == the unfused XLA transformer at B=8 (G=4) over the bench
    geometry, including the store-indexed scalar-prefetch variant."""
    import cor_tpu.models.sam_decoder as sd

    monkeypatch.setattr(sd, "GRID_FUSED", True)
    cfg, p = full_size_layer
    B, N, C = 8, twl._TILE * 4, 256
    g = int(np.sqrt(N))

    img = jnp.asarray(rng.standard_normal((B, g, g, C)).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.standard_normal((1, g, g, C)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)

    hs_ref, src_ref = two_way_transformer(p, img, pe, tokens, cfg, fused=False)
    hs_f, src_f = two_way_transformer(p, img, pe, tokens, cfg, fused=True)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(hs_ref), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(src_f), np.asarray(src_ref), atol=5e-4, rtol=5e-4)

    idx = np.array([5, 2, 7, 0, 1, 6, 3, 4], np.int32)
    hs_s, src_s = two_way_transformer(
        p, img, pe, tokens[jnp.asarray(idx)], cfg, fused=True,
        store_idx=jnp.asarray(idx),
    )
    np.testing.assert_allclose(
        np.asarray(hs_s), np.asarray(hs_f)[idx], atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(src_s), np.asarray(src_f)[idx], atol=5e-4, rtol=5e-4
    )


def test_two_way_layer_dma_matches_composition(full_size_layer, rng, monkeypatch):
    """The manual-DMA double-buffered layer kernel (keys in HBM, the kernel
    prefetches group i+1 / drains group i-1 around group i's body) == the
    unfused XLA transformer at B=12 (G=4 -> 3 grid steps, exercising the
    slot-reuse wait path), including the store-indexed and int8-store
    variants."""
    import cor_tpu.models.sam_decoder as sd

    monkeypatch.setattr(sd, "DMA_FUSED", True)
    cfg, p = full_size_layer
    B, N, C = 12, twl._TILE * 2, 256
    lp = p["layers"][0]

    # the sam_decoder dispatch itself (DMA_FUSED -> two_way_layer_dma for
    # BOTH layers of the fused transformer) vs the unfused composition
    g = 32  # 32*32 = 1024 rows = one row tile
    img = jnp.asarray(rng.standard_normal((8, g, g, C)).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.standard_normal((1, g, g, C)).astype(np.float32) * 0.3)
    toks = jnp.asarray(rng.standard_normal((8, 6, C)).astype(np.float32) * 0.5)
    hs_ref, src_ref = two_way_transformer(p, img, pe, toks, cfg, fused=False)
    hs_d, src_d = two_way_transformer(p, img, pe, toks, cfg, fused=True)
    np.testing.assert_allclose(np.asarray(hs_d), np.asarray(hs_ref), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(src_d), np.asarray(src_ref), atol=5e-4, rtol=5e-4)

    keys = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)
    key_pe = jnp.asarray(rng.standard_normal((1, N, C)).astype(np.float32) * 0.5)
    kpe = _matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0]
    qpe_img = _matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0]

    q_ref, k_ref = _two_way_block(
        lp, tokens, keys, tokens, key_pe, cfg.num_heads,
        skip_first_layer_pe=True, fused=False,
    )
    q_d, k_d = twl.two_way_layer_dma(
        lp, tokens, tokens, keys, kpe, qpe_img, cfg.num_heads, skip_pe=True
    )
    np.testing.assert_allclose(np.asarray(q_d), np.asarray(q_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(k_d), np.asarray(k_ref), atol=2e-4, rtol=2e-4)

    # store-indexed: decoding store rows idx through the DMA kernel == the
    # batch path reordered
    idx = np.array([5, 2, 7, 0, 1, 6, 3, 4, 11, 9, 10, 8], np.int32)
    q_s, k_s = twl.two_way_layer_dma(
        lp, tokens[jnp.asarray(idx)], tokens[jnp.asarray(idx)], keys,
        kpe, qpe_img, cfg.num_heads, skip_pe=True, keys_idx=jnp.asarray(idx),
    )
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_d)[idx], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_d)[idx], atol=2e-4, rtol=2e-4)

    # int8 store: DMA-kernel in-VMEM dequant == dequantize-then-decode
    scale = jnp.max(jnp.abs(keys.reshape(B, -1)), axis=1) / 127.0
    q8 = jnp.clip(jnp.round(keys / scale[:, None, None]), -127, 127).astype(jnp.int8)
    deq = (q8.astype(jnp.float32) * scale[:, None, None]).astype(jnp.float32)
    q_deq, k_deq = twl.two_way_layer_dma(
        lp, tokens, tokens, deq, kpe, qpe_img, cfg.num_heads, skip_pe=True
    )
    q_i8, k_i8 = twl.two_way_layer_dma(
        lp, tokens, tokens, q8, kpe, qpe_img, cfg.num_heads, skip_pe=True,
        keys_idx=jnp.arange(B, dtype=jnp.int32), keys_scale=scale,
    )
    np.testing.assert_allclose(np.asarray(q_i8), np.asarray(q_deq), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(k_i8), np.asarray(k_deq), atol=2e-4, rtol=2e-4)


def test_two_way_stack_fused_matches_composition(full_size_layer, rng, monkeypatch):
    """The whole-stack kernel (both layers + final t2i + norm_final in ONE
    pallas_call) == the unfused XLA transformer, at B=8 (G=4 grouping) over
    two row tiles, including the store-indexed scalar-prefetch variant.
    (Opt-in path — measured slower than the per-layer kernels on-chip, kept
    correct for re-evaluation on newer Mosaic.)"""
    import cor_tpu.models.sam_decoder as sd

    monkeypatch.setattr(sd, "STACK_FUSED", True)
    cfg, p = full_size_layer
    B, N, C = 8, twl._TILE * 4, 256
    g = int(np.sqrt(N))  # 64*64 = 4096 rows = the bench geometry

    img = jnp.asarray(rng.standard_normal((B, g, g, C)).astype(np.float32) * 0.3)
    pe = jnp.asarray(rng.standard_normal((1, g, g, C)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.standard_normal((B, 6, C)).astype(np.float32) * 0.5)

    hs_ref, src_ref = two_way_transformer(p, img, pe, tokens, cfg, fused=False)
    hs_f, src_f = two_way_transformer(p, img, pe, tokens, cfg, fused=True)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(hs_ref), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(src_f), np.asarray(src_ref), atol=5e-4, rtol=5e-4)

    # store-indexed: a permuted gather through the G=4 groups must equal
    # decoding the gathered batch directly
    idx = np.array([5, 2, 7, 0, 1, 6, 3, 4], np.int32)
    hs_s, src_s = two_way_transformer(
        p, img, pe, tokens[jnp.asarray(idx)], cfg, fused=True,
        store_idx=jnp.asarray(idx),
    )
    np.testing.assert_allclose(
        np.asarray(hs_s), np.asarray(hs_f)[idx], atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(src_s), np.asarray(src_f)[idx], atol=5e-4, rtol=5e-4
    )
