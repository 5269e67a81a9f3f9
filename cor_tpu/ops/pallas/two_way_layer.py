"""Pallas TPU kernel: one ENTIRE two-way transformer layer per grid step.

Reference dataflow (lib/sam_model/transformer.py:151-182, one
TwoWayAttentionBlock): token self-attention -> token->image cross-attention
-> token MLP -> image->token cross-attention, each + residual + LayerNorm.

The decode hot path runs this over [B, 4096, 256] image activations per
retrieved candidate. The round-1 kernels (t2i_flash, i2t_attention) fused the
two cross-attentions separately, but `keys` still made ~4 HBM round trips per
layer and q_img one more. Here the whole layer is ONE kernel with grid
(B/G,): each step loads G candidates' keys into VMEM once, runs every stage
of the layer — including all token-side ops — and writes keys back once.

CANDIDATE GROUPING (G): the token-side GEMMs are [8, 256]-shaped — an MXU
pass streams the full [K, N] weight block regardless of M, so M=8 wastes
~94% of the systolic rows and the ~20 token GEMMs per layer cost as much as
M=128 ones. Batching G candidates per grid step runs every token stage at
M=G*8 for the same pass count (G x amortization), while the image-side tile
loops (already M=1024) run per candidate inside the step. Cross-candidate
attention is structurally masked: the self-attention selector/logit-mask
constants are block-diagonal over candidates, and the two cross-attentions
slice per-candidate row blocks (sublane-aligned, HT=64). VMEM for the G keys
blocks exceeds the 16 MB default scoped budget — the chip has 128 MB
physical VMEM (probed: a 96 MB scratch kernel compiles and runs), so the
kernel raises `vmem_limit_bytes` accordingly.

Token-side per-head attention without reshapes/transposes (Mosaic rejects
lane-crossing reshapes): the (candidate, head, token) triples are unrolled
onto the SUBLANE axis with constant selector/mask GEMMs —

  qblk = (SEL @ q) * mask      SEL[(g*H+h)*T+t, g*T+t'] = 1{t==t'}
  l    = dot(qblk, k, contract lanes)   -> per-(candidate, head) logits
  out  = SELT @ (attn_out * mask)       SELT = SEL^T collapses heads

since per-head lane supports are disjoint, masking one operand of each
contraction yields exact per-head results, and the head collapse is a sum.
The image side streams in 1024-row tiles with flash accumulation for the
token->image softmax (the full 4096-wide row never materializes).

With ``keys_idx`` (retrieval decode), the keys operand is a candidate STORE
and each of the G per-step keys blocks is gathered directly via
scalar-prefetch block indexing — the batched gather (XLA: slice loop + full
layout-fix copy, ~13 ms per 1024 candidates traced) never materializes.

Forward-only (inference / retrieval); the training path keeps the
differentiable XLA composition. Numerics match the XLA `_two_way_block` to
bf16 rounding (tested in interpret mode and vs the composed decoder).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret

# fixed geometry for the SAM decoder (transformer_dim 256, heads 8,
# downsample_rate 2): token pad 8, image rows tiled by 1024
_T = 8  # padded token count (6 real: iou + 4 mask + 1 prompt)
_TILE = 1024
_GROUP = 4  # candidates per grid step (token-GEMM amortization factor)


def _ln_rows(z: jax.Array, scale, bias, eps: float) -> jax.Array:
    """Lane-wise LayerNorm over the channel axis (fp32 in/out)."""
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    y = (z - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """Contract the LANE axis of both operands: [M, C] x [N, C] -> [M, N]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    tokens_ref,  # [G, T, C] current token state
    qpe_tok_ref,  # [G, T, C] token positional prompts (the initial tokens)
    *refs,
    G: int,
    skip_pe: bool,
    eps: float,
    self_scale: float,
    cross_scale: float,
):
    keys_refs = refs[:G]  # G x [1, N, C] per-candidate image activations
    (
        # shared image-side constants (same block every step -> fetched once)
        kpe_ref,  # [N, I] t2i.k_proj(key_pe), no bias
        qpe_img_ref,  # [N, I] i2t.q_proj(key_pe), no bias
        w_img_ref,  # [C, 3I] packed (t2i.k | t2i.v | i2t.q) image projections
        b_img_ref,  # [1, 3I]
        # token self-attention (full dim C, head_dim 32)
        wq_s_ref, bq_s_ref, wk_s_ref, bk_s_ref, wv_s_ref, bv_s_ref, wo_s_ref, bo_s_ref,
        # layer norms
        ln1_s_ref, ln1_b_ref, ln2_s_ref, ln2_b_ref, ln3_s_ref, ln3_b_ref, ln4_s_ref, ln4_b_ref,
        # t2i token query + output projection
        wq_t_ref, bq_t_ref, wo_t_ref, bo_t_ref,
        # token MLP
        w1_ref, b1_ref, w2_ref, b2_ref,
        # i2t token key/value + output projection
        wk_i_ref, bk_i_ref, wv_i_ref, bv_i_ref, wo_i_ref, bo_i_ref,
        # constants (candidate-block-diagonal where marked)
        sel_ref,  # [G*HT, G*T] head-unroll selector, block-diag over candidates
        selt_ref,  # [G*T, G*HT] head collapse
        mask_c_ref,  # [G*HT, C] per-head lane mask, head_dim C/H
        mask_i_ref,  # [G*HT, I] per-head lane mask, head_dim I/H
        pb_tok_ref,  # [G*HT, G*T] -1e30 at cross-candidate / padded columns
        pb_ht_ref,  # [1, HT] -1e30 at (h, padded token) columns
        g_ref,  # [HT, HT] block-diag ones (per-head softmax normalizer)
        # outputs
        keys_out_ref,  # [G, N, C]
        tokens_out_ref,  # [G, T, C]
    ) = refs[G:]

    dt = keys_refs[0].dtype
    C = tokens_ref.shape[2]
    GT = G * _T
    x_tok = tokens_ref[...].reshape(GT, C).astype(jnp.float32)  # [G*T, C]
    qpe_t = qpe_tok_ref[...].reshape(GT, C).astype(jnp.float32)
    sel = sel_ref[:]
    selt = selt_ref[:]
    mask_c = mask_c_ref[:]
    mask_i = mask_i_ref[:]
    g = g_ref[:]
    GHT = sel.shape[0]
    HT = GHT // G

    # ------------------------------------------------------------------
    # 1) token self-attention (+ residual unless skip_pe) + LN1, batched
    #    over the G candidates; the candidate-block-diag pb_tok mask kills
    #    cross-candidate logits before the softmax
    # ------------------------------------------------------------------
    qin = x_tok if skip_pe else x_tok + qpe_t
    q_s = (_dot(qin.astype(dt), wq_s_ref[:]) + bq_s_ref[:]) * self_scale
    k_s = _dot(qin.astype(dt), wk_s_ref[:]) + bk_s_ref[:]
    v_s = _dot(x_tok.astype(dt), wv_s_ref[:]) + bv_s_ref[:]
    qblk = (_dot(sel, q_s.astype(dt)) * mask_c).astype(dt)  # [G*HT, C]
    l_s = _dot_t(qblk, k_s.astype(dt)) + pb_tok_ref[:]  # [G*HT, G*T]
    e_s = jnp.exp(l_s - jnp.max(l_s, axis=-1, keepdims=True))
    a_s = (e_s / jnp.sum(e_s, axis=-1, keepdims=True)).astype(dt)
    av_s = _dot(a_s, v_s.astype(dt))  # [G*HT, C] full-lane per (g, h, t) rows
    sa = _dot(selt, (av_s * mask_c).astype(dt))  # [G*T, C] head collapse
    sa = _dot(sa.astype(dt), wo_s_ref[:]) + bo_s_ref[:]
    x_tok = sa if skip_pe else x_tok + sa
    x_tok = _ln_rows(x_tok, ln1_s_ref[:], ln1_b_ref[:], eps)

    # ------------------------------------------------------------------
    # 2) token -> image cross-attention over row tiles (flash accumulation);
    #    the q projection + head unroll run batched, the tile streaming runs
    #    per candidate (each candidate attends only to its own keys)
    # ------------------------------------------------------------------
    q_t = (_dot((x_tok + qpe_t).astype(dt), wq_t_ref[:]) + bq_t_ref[:]) * cross_scale
    qblk_t = (_dot(sel, q_t.astype(dt)) * mask_i).astype(dt)  # [G*HT, I]

    n_rows = keys_refs[0].shape[1]
    n_tiles = n_rows // _TILE
    kv_w = w_img_ref[:]
    kv_b = b_img_ref[:]
    I = mask_i.shape[1]
    q_img_tiles = [[None] * n_tiles for _ in range(G)]
    t2i_blks = []
    for c in range(G):
        qb_c = qblk_t[c * HT : (c + 1) * HT]  # [HT, I] sublane-aligned slice
        m_acc = jnp.full((HT, 1), -1e30, jnp.float32)
        d_acc = jnp.zeros((HT, 1), jnp.float32)
        av_acc = jnp.zeros((HT, I), jnp.float32)
        for i in range(n_tiles):
            rows = keys_refs[c][0, pl.ds(i * _TILE, _TILE), :]  # [TILE, C] bf16
            imgp = _dot(rows, kv_w) + kv_b  # [TILE, 3I] fp32
            k_t = (imgp[:, :I] + kpe_ref[pl.ds(i * _TILE, _TILE), :]).astype(dt)
            v_t = imgp[:, I : 2 * I].astype(dt)
            q_img_tiles[c][i] = (
                imgp[:, 2 * I :] + qpe_img_ref[pl.ds(i * _TILE, _TILE), :]
            ).astype(dt)
            l_t = _dot_t(qb_c, k_t)  # [HT, TILE]
            m_new = jnp.maximum(m_acc, jnp.max(l_t, axis=-1, keepdims=True))
            alpha = jnp.exp(m_acc - m_new)
            e_t = jnp.exp(l_t - m_new)
            av_acc = av_acc * alpha + _dot(e_t.astype(dt), v_t)
            d_acc = d_acc * alpha + jnp.sum(e_t, axis=-1, keepdims=True)
            m_acc = m_new
        t2i_blks.append(av_acc / d_acc)  # [HT, I]
    t2i_blk = jnp.concatenate(t2i_blks, axis=0)  # [G*HT, I]
    t2i_out = _dot(selt, (t2i_blk * mask_i).astype(dt))  # [G*T, I]
    x_tok = x_tok + _dot(t2i_out.astype(dt), wo_t_ref[:]) + bo_t_ref[:]
    x_tok = _ln_rows(x_tok, ln2_s_ref[:], ln2_b_ref[:], eps)

    # ------------------------------------------------------------------
    # 3) token MLP (ReLU) + LN3, batched
    # ------------------------------------------------------------------
    h = jnp.maximum(_dot(x_tok.astype(dt), w1_ref[:]) + b1_ref[:], 0.0)
    x_tok = x_tok + _dot(h.astype(dt), w2_ref[:]) + b2_ref[:]
    x_tok = _ln_rows(x_tok, ln3_s_ref[:], ln3_b_ref[:], eps)
    tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)

    # ------------------------------------------------------------------
    # 4) image -> token cross-attention + LN4, tile-local per candidate
    # ------------------------------------------------------------------
    k_i = _dot((x_tok + qpe_t).astype(dt), wk_i_ref[:]) + bk_i_ref[:]
    v_i = _dot(x_tok.astype(dt), wv_i_ref[:]) + bv_i_ref[:]
    kblk = ((_dot(sel, k_i.astype(dt)) * mask_i)).astype(dt)  # [G*HT, I]
    vblk = ((_dot(sel, v_i.astype(dt)) * mask_i)).astype(dt)  # [G*HT, I]
    wo_i = wo_i_ref[:]
    bo_i = bo_i_ref[:]
    # Per-head softmax shift (the reference softmax is per-head): a GLOBAL
    # max would underflow e2 to 0 across an entire head whose logits sit
    # ~88+ below another head's max, zeroing its normalizer d2 -> NaN.
    # Softmax is invariant to ANY uniform per-head shift, so instead of the
    # per-head MAX (per-head lane slices / roll tournaments both measured
    # ~11-25% of end-to-end pipeline throughput in lane-shuffle cost) use
    # the per-head MEAN over real token lanes — one MXU GEMM against the
    # existing block-diag `g`. Exact, and d2 >= exp(max-mean) >= 1 so the
    # normalizer can never underflow to 0 regardless of cross-head spread.
    # Only limitation: exp overflows if a single head's internal logit
    # RANGE (max - mean) exceeds ~88 — attention logits are O(10), and even
    # logit range 80 is already a hard one-hot, so this regime is
    # unreachable in practice (the cross-head spread that caused the NaN is
    # handled exactly at ANY magnitude).
    rl = (pb_ht_ref[:] > -1.0).astype(jnp.float32)  # [1, HT] real-lane mask
    counts = _dot(rl.astype(dt), g.astype(dt))  # [1, HT]: real lanes per head
    for c in range(G):
        kb_c = kblk[c * HT : (c + 1) * HT]
        vb_c = vblk[c * HT : (c + 1) * HT]
        for i in range(n_tiles):
            q_img = q_img_tiles[c][i]  # [TILE, I] bf16
            l2 = _dot_t((q_img.astype(jnp.float32) * cross_scale).astype(dt), kb_c)
            l2 = l2 + pb_ht_ref[:]  # [TILE, HT]
            m2 = _dot((l2 * rl).astype(dt), g.astype(dt)) / counts  # per-head mean
            e2 = jnp.exp(l2 - m2)
            d2 = _dot(e2.astype(dt), g.astype(dt))  # per-head normalizer
            a2 = (e2 / d2).astype(dt)
            av2 = _dot(a2, vb_c)  # [TILE, I] disjoint per-head lanes
            o2 = _dot(av2.astype(dt), wo_i) + bo_i  # [TILE, C]
            rows = keys_refs[c][0, pl.ds(i * _TILE, _TILE), :].astype(jnp.float32)
            z = _ln_rows(rows + o2, ln4_s_ref[:], ln4_b_ref[:], eps)
            keys_out_ref[c, pl.ds(i * _TILE, _TILE), :] = z.astype(keys_out_ref.dtype)


def _constants(num_heads: int, c_dim: int, i_dim: int, n_real_tokens: int, dt, G: int):
    """Selector / mask / normalizer constants for the head-unrolled layout,
    block-diagonal over the G grouped candidates."""
    H, T = num_heads, _T
    HT = H * T
    sel1 = np.zeros((HT, T), np.float32)
    for h in range(H):
        sel1[h * T : (h + 1) * T] = np.eye(T, dtype=np.float32)
    sel = np.kron(np.eye(G, dtype=np.float32), sel1)  # [G*HT, G*T]
    selt = sel.T.copy()
    def lane_mask(dim):
        hd = dim // H
        m = np.zeros((HT, dim), np.float32)
        for h in range(H):
            m[h * T : (h + 1) * T, h * hd : (h + 1) * hd] = 1.0
        return np.tile(m, (G, 1))  # [G*HT, dim]
    # additive logit mask for the batched self-attention: row (g, h, t) may
    # attend only to columns (g, t') with t' a real token of the SAME
    # candidate g — everything else (padded tokens, other candidates) -1e30
    col_real = np.zeros((G, T), np.float32)
    col_real[:, :n_real_tokens] = 1.0
    pb_tok = np.full((G * HT, G * T), -1e30, np.float32)
    for gi in range(G):
        pb_tok[gi * HT : (gi + 1) * HT, gi * T : (gi + 1) * T] = np.where(
            col_real[gi][None, :] > 0, 0.0, -1e30
        )
    pb_ht = np.zeros((1, HT), np.float32)
    for h in range(H):
        pb_ht[0, h * T + n_real_tokens : (h + 1) * T] = -1e30
    g = np.kron(np.eye(H, dtype=np.float32), np.ones((T, T), np.float32))
    to = lambda x: jnp.asarray(x, dt)
    return (
        to(sel), to(selt), to(lane_mask(c_dim)), to(lane_mask(i_dim)),
        jnp.asarray(pb_tok, jnp.float32), jnp.asarray(pb_ht, jnp.float32),
        to(g),
    )


def _bias2d(b, dt=None):
    b = b.reshape(1, -1)
    return b if dt is None else b.astype(dt)


def two_way_layer_fused(
    lp,  # layer params (sam_decoder._init_two_way_block naming)
    tokens: jax.Array,  # [B, n_tok, C] (n_tok <= 8)
    qpe_tok: jax.Array,  # [B, n_tok, C]
    keys: jax.Array,  # [B, N, C]
    kpe: jax.Array,  # [N, I] precomputed t2i.k_proj(key_pe)
    qpe_img: jax.Array,  # [N, I] precomputed i2t.q_proj(key_pe)
    num_heads: int,
    skip_pe: bool,
    eps: float = 1e-5,
    keys_idx: jax.Array = None,  # optional int32 [B]: keys is a STORE [S, N, C]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens', keys') — one fused TwoWayAttentionBlock.

    With ``keys_idx``, ``keys`` is a candidate STORE and the G keys blocks of
    grid step i read rows ``keys_idx[i*G+g]`` directly via scalar-prefetch
    block indexing — the batched gather (which XLA lowers to a slice loop +
    a full layout-fix copy, ~13 ms per 1024 candidates traced) never
    materializes.
    """
    B, n_tok, C = tokens.shape
    N = keys.shape[1]
    dt = keys.dtype
    I = lp["cross_attn_t2i"]["q_proj"]["w"].shape[-1]
    assert N % _TILE == 0 and n_tok <= _T
    if keys_idx is not None:
        assert keys_idx.shape == (B,) and keys.shape[2] == C

    G = max(gg for gg in (_GROUP, 2, 1) if B % gg == 0)

    pad = _T - n_tok
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        qpe_tok = jnp.pad(qpe_tok, ((0, 0), (0, pad), (0, 0)))

    t2i, i2t, sa = lp["cross_attn_t2i"], lp["cross_attn_i2t"], lp["self_attn"]
    w_img = jnp.concatenate(
        [t2i["k_proj"]["w"], t2i["v_proj"]["w"], i2t["q_proj"]["w"]], axis=1
    ).astype(dt)
    b_img = jnp.concatenate(
        [t2i["k_proj"]["b"], t2i["v_proj"]["b"], i2t["q_proj"]["b"]]
    ).reshape(1, -1).astype(jnp.float32)

    consts = _constants(num_heads, C, I, n_tok, dt, G)
    self_scale = 1.0 / float(np.sqrt(C // num_heads))
    cross_scale = 1.0 / float(np.sqrt(I // num_heads))

    prefetch = keys_idx is not None
    if prefetch:
        # index_maps gain the scalar-prefetch ref as a trailing arg
        cdim = lambda *shape: pl.BlockSpec(
            shape, lambda i, s: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        grp3 = lambda *shape: pl.BlockSpec(
            shape, lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        )
        keys_specs = [
            pl.BlockSpec(
                (1, N, C), lambda i, s, g=g: (s[i * G + g], 0, 0),
                memory_space=pltpu.VMEM,
            )
            for g in range(G)
        ]
    else:
        cdim = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        grp3 = lambda *shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        keys_specs = [
            pl.BlockSpec(
                (1, N, C), lambda i, g=g: (i * G + g, 0, 0), memory_space=pltpu.VMEM
            )
            for g in range(G)
        ]

    mlp = lp["mlp"]
    args = [
        tokens, qpe_tok, *([keys] * G),
        kpe.astype(dt), qpe_img.astype(dt), w_img, b_img,
        sa["q_proj"]["w"].astype(dt), _bias2d(sa["q_proj"]["b"], jnp.float32),
        sa["k_proj"]["w"].astype(dt), _bias2d(sa["k_proj"]["b"], jnp.float32),
        sa["v_proj"]["w"].astype(dt), _bias2d(sa["v_proj"]["b"], jnp.float32),
        sa["out_proj"]["w"].astype(dt), _bias2d(sa["out_proj"]["b"], jnp.float32),
        _bias2d(lp["norm1"]["scale"]), _bias2d(lp["norm1"]["bias"]),
        _bias2d(lp["norm2"]["scale"]), _bias2d(lp["norm2"]["bias"]),
        _bias2d(lp["norm3"]["scale"]), _bias2d(lp["norm3"]["bias"]),
        _bias2d(lp["norm4"]["scale"]), _bias2d(lp["norm4"]["bias"]),
        t2i["q_proj"]["w"].astype(dt), _bias2d(t2i["q_proj"]["b"], jnp.float32),
        t2i["out_proj"]["w"].astype(dt), _bias2d(t2i["out_proj"]["b"], jnp.float32),
        mlp["lin1"]["w"].astype(dt), _bias2d(mlp["lin1"]["b"], jnp.float32),
        mlp["lin2"]["w"].astype(dt), _bias2d(mlp["lin2"]["b"], jnp.float32),
        i2t["k_proj"]["w"].astype(dt), _bias2d(i2t["k_proj"]["b"], jnp.float32),
        i2t["v_proj"]["w"].astype(dt), _bias2d(i2t["v_proj"]["b"], jnp.float32),
        i2t["out_proj"]["w"].astype(dt), _bias2d(i2t["out_proj"]["b"], jnp.float32),
        *consts,
    ]
    in_specs = []
    for a in args[:2]:
        in_specs.append(grp3(G, a.shape[1], a.shape[2]))
    in_specs.extend(keys_specs)
    for a in args[2 + G :]:
        in_specs.append(cdim(*a.shape))

    kernel = functools.partial(
        _kernel,
        G=G,
        skip_pe=skip_pe,
        eps=eps,
        self_scale=self_scale,
        cross_scale=cross_scale,
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, N, C), dt),
        jax.ShapeDtypeStruct((B, _T, C), dt),
    )
    out_specs = (grp3(G, N, C), grp3(G, _T, C))
    # G keys blocks in + a [G, N, C] block out, each double-buffered across
    # grid steps, plus weights and fp32 tile intermediates: the 16 MB default
    # scoped-VMEM budget is too small for G > 1. The chip has 128 MB physical
    # VMEM; budget ~4x the keys traffic + fixed overhead.
    vmem_limit = min(100, 12 + G * 18) * 1024 * 1024
    params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    if prefetch:
        keys_out, tokens_out = pl.pallas_call(
            lambda idx_ref, *refs: kernel(*refs),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // G,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            compiler_params=params,
            interpret=_interpret(),
        )(keys_idx.astype(jnp.int32), *args)
    else:
        keys_out, tokens_out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(B // G,),
            in_specs=in_specs,
            out_specs=out_specs,
            compiler_params=params,
            interpret=_interpret(),
        )(*args)

    # scale q AFTER t2i bias (the reference scales q post-projection): note the
    # kernel applies cross_scale to (proj + bias) jointly — identical math.
    return tokens_out[:, :n_tok, :], keys_out
