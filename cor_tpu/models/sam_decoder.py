"""SAM mask decoder + TwoWayTransformer, TPU-native.

Parity targets:
- TwoWayTransformer (reference: lib/sam_model/transformer.py:16-106): depth-2
  stack of {token self-attn, token->image cross-attn, token MLP,
  image->token cross-attn}, attention_downsample_rate=2 halves the internal
  dim of cross-attention, plus a final token->image attention + LN.
- MaskDecoder (reference: lib/sam_model/mask_decoder.py:16-142): tokens =
  [iou_token ; mask_tokens(4) ; sparse prompts], transformer against
  image embedding + dense prompt, 4x upscale via two stride-2 transposed convs
  (256->64->32 ch), per-mask-token hypernetwork MLPs to 32-d weights, masks =
  hyper_in @ upscaled (channel dot product), IoU-quality MLP head.

TPU-first deltas:
- NHWC layout; transposed convs use the native XLA lowering with pre-flipped
  kernels; PE additions are decomposed through the linear projections.
- Inference paths (fused=True) run hand-written Pallas kernels: flash
  token->image attention with in-VMEM projections (ops/pallas/t2i_flash),
  fully-fused image->token attention + out_proj + residual + LN
  (ops/pallas/i2t_attention), and the whole upscale tail in one pass
  (ops/pallas/decoder_tail). The training path keeps the differentiable XLA
  composition; fused == unfused is asserted by tests.
- `multimask` best-mask selection stays inside the compiled graph via
  take_along_axis (reference does it in the top model, sam_with_sup_branch.py:96-100);
  only the selected mask token's map is computed (gradient-identical).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from cor_tpu.ops.attention import attention_heads, attention_qkv, init_attention_qkv
from cor_tpu.ops.pallas.decoder_tail import fused_decoder_tail
from cor_tpu.ops.pallas.i2t_attention import i2t_attention_fused
from cor_tpu.ops.pallas.t2i_flash import proj_q_t2i_flash, t2i_flash_kv
from cor_tpu.ops.common import (
    Params,
    _torch_uniform,
    dense,
    init_layer_norm,
    init_mlp_block,
    init_mlp_stack,
    layer_norm,
    mlp_block,
    mlp_stack,
    gelu,
)


# opt-in whole-stack decode fusion (see the negative-result note at the use
# site in two_way_transformer; flip for re-measuring on newer Mosaic)
STACK_FUSED = False
# layer-as-grid-dimension decode fusion (two_way_layer.two_way_grid_fused):
# the stack kernel's HBM contract (keys once in / once out) with the
# per-layer kernel's per-step body — A/B-able via tools/decode_bench.py
GRID_FUSED = False
# manual double-buffered keys DMA in the per-layer kernel
# (two_way_layer.two_way_layer_dma): keys live in HBM and the kernel itself
# prefetches group i+1 / drains group i-1 around group i's body, probing the
# measured DMA+compute SERIALIZATION of the auto-pipelined kernel —
# A/B-able via tools/decode_bench.py --variant dma
DMA_FUSED = False


@dataclass(frozen=True)
class TwoWayTransformerConfig:
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2


@dataclass(frozen=True)
class MaskDecoderConfig:
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer: TwoWayTransformerConfig = TwoWayTransformerConfig()

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


# ---------------------------------------------------------------------------
# TwoWayTransformer
# ---------------------------------------------------------------------------


def init_two_way_transformer(key: jax.Array, cfg: TwoWayTransformerConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 1)
    layers = []
    for i in range(cfg.depth):
        k = jax.random.split(keys[i], 4)
        layers.append(
            {
                "self_attn": init_attention_qkv(k[0], cfg.embedding_dim, cfg.num_heads),
                "norm1": init_layer_norm(cfg.embedding_dim),
                "cross_attn_t2i": init_attention_qkv(
                    k[1], cfg.embedding_dim, cfg.num_heads, cfg.attention_downsample_rate
                ),
                "norm2": init_layer_norm(cfg.embedding_dim),
                "mlp": init_mlp_block(k[2], cfg.embedding_dim, cfg.mlp_dim),
                "norm3": init_layer_norm(cfg.embedding_dim),
                "norm4": init_layer_norm(cfg.embedding_dim),
                "cross_attn_i2t": init_attention_qkv(
                    k[3], cfg.embedding_dim, cfg.num_heads, cfg.attention_downsample_rate
                ),
            }
        )
    kf = keys[-1]
    return {
        "layers": layers,
        "final_attn_t2i": init_attention_qkv(
            kf, cfg.embedding_dim, cfg.num_heads, cfg.attention_downsample_rate
        ),
        "norm_final": init_layer_norm(cfg.embedding_dim),
    }


def _matmul_nobias(p: Params, x: jax.Array) -> jax.Array:
    """x @ w without the bias (for linear PE decompositions)."""
    return jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def _two_way_block(
    lp: Params,
    queries: jax.Array,
    keys: jax.Array,
    query_pe: jax.Array,
    key_pe: jax.Array,
    num_heads: int,
    skip_first_layer_pe: bool,
    ln_eps: float = 1e-5,
    fused: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One two-way block (reference: transformer.py:151-182).

    TPU bandwidth optimizations, all exact linear rewrites of the reference:
    - `proj(keys + key_pe)` is decomposed as `proj(keys) + proj(key_pe)`:
      key_pe is batch-size-1 and loop-invariant, so its projections are tiny
      [1, N, C] matmuls instead of materializing [B, N, C] adds per layer.
    - the image-side residual add + LayerNorm runs as one fused Pallas pass.
    """
    # token self-attention (reference: transformer.py:154-161)
    if skip_first_layer_pe:
        queries = attention_qkv(lp["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + attention_qkv(lp["self_attn"], q, q, queries, num_heads)
    queries = layer_norm(lp["norm1"], queries, eps=ln_eps)

    # Image-side projections: t2i.k, t2i.v and i2t.q all consume `keys`.
    # key_pe enters through the linear projections only (bias-free pe path),
    # so proj(keys) + proj(key_pe) equals the reference's proj(keys + key_pe).
    # On inference paths a multi-output Pallas kernel reads the keys tile
    # once and emits all three projections (XLA would materialize the slices
    # of a concatenated GEMM as separate full passes).
    t2i, i2t = lp["cross_attn_t2i"], lp["cross_attn_i2t"]
    kpe = _matmul_nobias(t2i["k_proj"], key_pe)
    qpe = _matmul_nobias(i2t["q_proj"], key_pe)
    q = queries + query_pe
    q_tok_t2i = dense(t2i["q_proj"], q)
    if fused:
        # one streaming pass: k/v projections stay in VMEM and feed a flash
        # token->image attention; q_img (for the later image->token attention)
        # is emitted alongside (cor_tpu.ops.pallas.t2i_flash)
        q_img, t2i_out = proj_q_t2i_flash(
            keys,
            t2i["k_proj"]["w"], t2i["k_proj"]["b"],
            t2i["v_proj"]["w"], t2i["v_proj"]["b"],
            i2t["q_proj"]["w"], i2t["q_proj"]["b"],
            kpe[0], qpe[0], q_tok_t2i, num_heads,
        )
    else:
        k_img = dense(t2i["k_proj"], keys) + kpe
        v_img = dense(t2i["v_proj"], keys)
        q_img = dense(i2t["q_proj"], keys) + qpe
        t2i_out = attention_heads(q_tok_t2i, k_img, v_img, num_heads)

    # token -> image cross-attention epilogue
    queries = queries + dense(t2i["out_proj"], t2i_out)
    queries = layer_norm(lp["norm2"], queries, eps=ln_eps)

    # token MLP (ReLU — reference transformer uses activation=nn.ReLU default)
    queries = queries + mlp_block(lp["mlp"], queries, act=jax.nn.relu)
    queries = layer_norm(lp["norm3"], queries, eps=ln_eps)

    # image -> token cross-attention (image side is the attention query).
    # Only ~6 token keys: the whole attention + out_proj + residual + LN is
    # tile-local over the image rows and fuses into one Pallas pass.
    q = queries + query_pe
    k_tok = dense(i2t["k_proj"], q)
    v_tok = dense(i2t["v_proj"], queries)
    if fused:
        keys = i2t_attention_fused(
            q_img,
            keys,
            k_tok,
            v_tok,
            i2t["out_proj"]["w"],
            i2t["out_proj"]["b"],
            lp["norm4"]["scale"],
            lp["norm4"]["bias"],
            num_heads=num_heads,
            eps=ln_eps,
        )
    else:
        attn_out = dense(
            i2t["out_proj"], attention_heads(q_img, k_tok, v_tok, num_heads)
        )
        keys = layer_norm(lp["norm4"], keys + attn_out, eps=ln_eps)
    return queries, keys


def two_way_transformer(
    p: Params,
    image_embedding: jax.Array,  # [B, H, W, C] NHWC (or a STORE [S, H, W, C])
    image_pe: jax.Array,  # [B or 1, H, W, C]
    point_embedding: jax.Array,  # [B, N_tokens, C]
    cfg: TwoWayTransformerConfig,
    fused: bool = False,
    store_idx: jax.Array = None,  # int32 [B]: image_embedding is a store;
    # row store_idx[b] feeds batch element b (retrieval decode — the gather
    # is absorbed into the first fused layer's scalar-prefetch block reads)
    store_scale: jax.Array = None,  # fp32 [S]: the store is int8 per-row
    # symmetric quantized; row s dequantizes as store[s] * store_scale[s]
    # (requires store_idx — 4x less store HBM, dequant inside the kernel)
) -> Tuple[jax.Array, jax.Array]:
    S, H, W, C = image_embedding.shape
    if store_scale is not None:
        assert store_idx is not None, "int8 stores require store-indexed decode"
    comp_dt = point_embedding.dtype if store_scale is not None else image_embedding.dtype
    keys = image_embedding.reshape(S, H * W, C)
    # key_pe stays batch-1: it only enters through linear projections, which
    # broadcast (see _two_way_block's PE decomposition)
    key_pe = image_pe.reshape(1, H * W, C).astype(comp_dt)

    queries = point_embedding
    query_pe = point_embedding

    # whole-layer Pallas fusion: keys stay VMEM-resident across every stage
    # of a TwoWayAttentionBlock (one HBM read + one write per layer instead
    # of ~5 round trips) — cor_tpu.ops.pallas.two_way_layer
    from cor_tpu.ops.pallas.two_way_layer import _T as _TOK_PAD, _TILE as _ROW_TILE

    layer_fused = (
        fused
        and (H * W) % _ROW_TILE == 0
        and point_embedding.shape[1] <= _TOK_PAD
        and C % cfg.num_heads == 0
    )

    if layer_fused and len(p["layers"]) == 2 and GRID_FUSED and store_scale is None:
        # layer-as-grid-dimension fusion: grid (B/G, 2) with pl.when on the
        # layer index — keys cross HBM once in/once out (the stack kernel's
        # saving) while each grid step executes only ONE layer's ops (the
        # per-layer kernel's schedule)
        from cor_tpu.ops.pallas.two_way_layer import two_way_grid_fused

        kpe_layers, qpe_layers = [], []
        for lp in p["layers"]:
            kpe_layers.append(_matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0])
            qpe_layers.append(_matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0])
        kpe_f = _matmul_nobias(p["final_attn_t2i"]["k_proj"], key_pe)[0]
        queries, keys = two_way_grid_fused(
            p, queries, query_pe, keys, kpe_layers, qpe_layers, kpe_f,
            cfg.num_heads, keys_idx=store_idx,
        )
        return queries, keys

    if layer_fused and len(p["layers"]) == 2 and STACK_FUSED and store_scale is None:
        # whole-stack fusion: both layers + final t2i + norm_final in ONE
        # kernel — keys cross HBM once in, once out. MEASURED NEGATIVE
        # (round 3, defaults OFF): 4.4 ms vs 3.9 ms for the per-layer
        # kernels on a 128-candidate chunk despite half the HBM traffic —
        # Mosaic's per-step cost grows super-linearly with kernel body size
        # (2x the layer body costs ~2.4x its compute; VMEM-value tiles and a
        # fixed scratch ref measure the same), overwhelming the saved DMA
        # (2 MB/candidate/boundary at the chip's measured ~410 GB/s stream
        # rate). Kept opt-in for future Mosaic versions.
        from cor_tpu.ops.pallas.two_way_layer import two_way_stack_fused

        kpe_layers, qpe_layers = [], []
        for lp in p["layers"]:
            kpe_layers.append(_matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0])
            qpe_layers.append(_matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0])
        kpe_f = _matmul_nobias(p["final_attn_t2i"]["k_proj"], key_pe)[0]
        queries, keys = two_way_stack_fused(
            p, queries, query_pe, keys, kpe_layers, qpe_layers, kpe_f,
            cfg.num_heads, keys_idx=store_idx,
        )
        return queries, keys

    for i, lp in enumerate(p["layers"]):
        if layer_fused:
            from cor_tpu.ops.pallas.two_way_layer import (
                two_way_layer_dma,
                two_way_layer_fused,
            )

            kpe_l = _matmul_nobias(lp["cross_attn_t2i"]["k_proj"], key_pe)[0]
            qpe_l = _matmul_nobias(lp["cross_attn_i2t"]["q_proj"], key_pe)[0]
            layer_fn = two_way_layer_dma if DMA_FUSED else two_way_layer_fused
            queries, keys = layer_fn(
                lp, queries, query_pe, keys, kpe_l, qpe_l, cfg.num_heads,
                skip_pe=(i == 0),
                keys_idx=store_idx if i == 0 else None,
                keys_scale=store_scale if i == 0 else None,
            )
        else:
            if i == 0 and store_idx is not None:
                keys = jnp.take(keys, store_idx, axis=0)  # gather fallback
                if store_scale is not None:
                    keys = (
                        keys.astype(jnp.float32)
                        * store_scale[store_idx][:, None, None]
                    ).astype(comp_dt)
            queries, keys = _two_way_block(
                lp, queries, keys, query_pe, key_pe, cfg.num_heads,
                skip_first_layer_pe=(i == 0), fused=fused,
            )

    fa = p["final_attn_t2i"]
    q = queries + query_pe
    q_tok = dense(fa["q_proj"], q)
    kpe = _matmul_nobias(fa["k_proj"], key_pe)
    if fused:
        attn_out = t2i_flash_kv(
            keys,
            fa["k_proj"]["w"], fa["k_proj"]["b"],
            fa["v_proj"]["w"], fa["v_proj"]["b"],
            kpe[0], q_tok, cfg.num_heads,
        )
    else:
        k_img = dense(fa["k_proj"], keys) + kpe
        attn_out = attention_heads(q_tok, k_img, dense(fa["v_proj"], keys), cfg.num_heads)
    queries = queries + dense(fa["out_proj"], attn_out)
    queries = layer_norm(p["norm_final"], queries, eps=1e-5)
    return queries, keys


# ---------------------------------------------------------------------------
# MaskDecoder
# ---------------------------------------------------------------------------


def init_mask_decoder(key: jax.Array, cfg: MaskDecoderConfig) -> Params:
    d = cfg.transformer_dim
    nmt = cfg.num_mask_tokens
    keys = jax.random.split(key, 6 + nmt)

    # embeddings: torch nn.Embedding default init = N(0, 1)
    iou_token = jax.random.normal(keys[0], (1, d), jnp.float32)
    mask_tokens = jax.random.normal(keys[1], (nmt, d), jnp.float32)

    # upscaling transposed convs as einsum kernels [C_in, 2, 2, C_out];
    # torch ConvTranspose2d init: U(+-1/sqrt(fan_in)), fan_in = C_in * kh * kw
    k_up1, k_up1b = jax.random.split(keys[2])
    k_up2, k_up2b = jax.random.split(keys[3])
    up1_fan = d * 2 * 2
    up2_fan = (d // 4) * 2 * 2
    upscale = {
        "convt1": {
            "w": _torch_uniform(k_up1, (d, 2, 2, d // 4), up1_fan),
            "b": _torch_uniform(k_up1b, (d // 4,), up1_fan),
        },
        "ln": init_layer_norm(d // 4),
        "convt2": {
            "w": _torch_uniform(k_up2, (d // 4, 2, 2, d // 8), up2_fan),
            "b": _torch_uniform(k_up2b, (d // 8,), up2_fan),
        },
    }

    hyper = [
        init_mlp_stack(keys[4 + i], d, d, d // 8, 3) for i in range(nmt)
    ]
    return {
        "iou_token": iou_token,
        "mask_tokens": mask_tokens,
        "transformer": init_two_way_transformer(keys[-2], cfg.transformer),
        "output_upscaling": upscale,
        "output_hypernetworks_mlps": hyper,
        "iou_prediction_head": init_mlp_stack(
            keys[-1], d, cfg.iou_head_hidden_dim, nmt, cfg.iou_head_depth
        ),
    }


def _conv_transpose_2x(p: Params, x: jax.Array) -> jax.Array:
    """2x2/stride-2 transposed conv via lax.conv_transpose (native TPU path).

    out[b, 2i+di, 2j+dj, o] = sum_c x[b, i, j, c] * w[c, di, dj, o] + bias —
    exact ConvTranspose2d(kernel=2, stride=2) semantics. lax.conv_transpose
    spatially flips the HWIO kernel, so we pre-flip; measured ~1.7x faster on
    TPU than the equivalent einsum+pixel-shuffle formulation.
    """
    w = p["w"].astype(x.dtype)  # [C, 2, 2, O]
    k = w.transpose(1, 2, 0, 3)[::-1, ::-1]  # [2, 2, C, O], pre-flipped
    # NOTE: no preferred_element_type here — its VJP rule produces a
    # mixed-dtype conv_general_dilated (bf16 kernel x fp32 cotangent) that
    # fails to trace; the TPU MXU accumulates in fp32 internally regardless.
    y = jax.lax.conv_transpose(
        x,
        k,
        strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["b"].astype(x.dtype)
    return y.astype(x.dtype)


def mask_decoder(
    p: Params,
    image_embeddings: jax.Array,  # [B, H, W, C]
    image_pe: jax.Array,  # [1, H, W, C]
    sparse_prompt_embeddings: jax.Array,  # [B, N_s, C]
    dense_prompt_embeddings: jax.Array,  # [B, H, W, C]
    cfg: MaskDecoderConfig,
    multimask_output: bool,
    fused: bool = False,
    store_idx: jax.Array = None,  # int32 [B]: image_embeddings is a STORE
    # [S, H, W, C] and row store_idx[b] decodes for batch element b (dense
    # prompt must be pre-baked into the store — pass dense=None)
    store_scale: jax.Array = None,  # fp32 [S]: the store is int8 per-row
    # quantized (see retrieval.engine.quantize_candidate_store) — 4x less
    # store HBM; rows dequantize inside the first fused two-way layer
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (masks [B, n_out, 4H, 4W], iou_pred [B, n_out], src [B, HW, C])."""
    S, H, W, C = image_embeddings.shape
    B = store_idx.shape[0] if store_idx is not None else S
    nmt = cfg.num_mask_tokens
    if store_idx is not None:
        assert dense_prompt_embeddings is None, (
            "store-indexed decode requires the dense prompt pre-baked into "
            "the store (dense_prompt_embeddings=None)"
        )
    comp_dt = (
        sparse_prompt_embeddings.dtype
        if store_scale is not None
        else image_embeddings.dtype
    )

    output_tokens = jnp.concatenate(
        [p["iou_token"], p["mask_tokens"]], axis=0
    ).astype(comp_dt)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, 1 + nmt, C))
    tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

    # dense_prompt_embeddings=None means the caller pre-added the dense
    # prompt (e.g. the retrieval engine bakes the constant no_mask_embed into
    # its candidate store at indexing time — saves one full HBM pass)
    if dense_prompt_embeddings is None:
        src = image_embeddings
    else:
        src = image_embeddings + dense_prompt_embeddings

    hs, src_seq = two_way_transformer(
        p["transformer"], src, image_pe, tokens, cfg.transformer, fused=fused,
        store_idx=store_idx, store_scale=store_scale,
    )
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1 : 1 + nmt, :]  # [B, nmt, C]

    # upscale 4x: [B, H, W, C] -> [B, 4H, 4W, C//8]
    src_grid = src_seq.reshape(B, H, W, C)
    up = p["output_upscaling"]

    # hypernetwork: per-mask-token 3-layer ReLU MLP -> weights for the
    # channel dot-product against the upscaled embedding. The reference
    # computes all num_mask_tokens maps and slices afterwards
    # (mask_decoder.py:135-137 + forward's mask_slice); only the selected
    # slice is ever used (and gradients flow only through it), so we compute
    # just the needed tokens — 4x less bandwidth on the [B, 4H, 4W] output.
    token_ids = list(range(1, nmt)) if multimask_output else [0]
    hyper_in = jnp.stack(
        [
            mlp_stack(p["output_hypernetworks_mlps"][i], mask_tokens_out[:, i, :])
            for i in token_ids
        ],
        axis=1,
    )  # [B, n_out, C//8]

    if fused:
        # forward-only Pallas fusion of the whole tail (convT1 + LN + GELU +
        # convT2 + GELU + hypernetwork dot) — the up-to-0.5 GB intermediates
        # never leave VMEM (cor_tpu.ops.pallas.decoder_tail)
        masks = fused_decoder_tail(
            src_grid,
            up["convt1"]["w"].astype(src_grid.dtype),
            up["convt1"]["b"],
            up["ln"]["scale"],
            up["ln"]["bias"],
            up["convt2"]["w"].astype(src_grid.dtype),
            up["convt2"]["b"],
            hyper_in,
        ).astype(comp_dt)
    else:
        x = _conv_transpose_2x(up["convt1"], src_grid)
        x = layer_norm(up["ln"], x, eps=1e-6)
        x = gelu(x)
        upscaled = gelu(_conv_transpose_2x(up["convt2"], x))  # [B, 4H, 4W, C//8]
        masks = jnp.einsum(
            "bnc,bhwc->bnhw",
            hyper_in,
            upscaled,
            preferred_element_type=jnp.float32,
        ).astype(comp_dt)  # [B, n_out, 4H, 4W]

    iou_pred = mlp_stack(p["iou_prediction_head"], iou_token_out)  # [B, nmt]
    iou_pred = iou_pred[:, 1:] if multimask_output else iou_pred[:, 0:1]
    return masks, iou_pred, src_seq
