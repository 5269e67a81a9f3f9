"""Pallas TPU kernels: fused two-way transformer layers (and the whole stack).

Reference dataflow (lib/sam_model/transformer.py:151-182, one
TwoWayAttentionBlock): token self-attention -> token->image cross-attention
-> token MLP -> image->token cross-attention, each + residual + LayerNorm.

The decode hot path runs this over [B, 4096, 256] image activations per
retrieved candidate. The round-1 kernels (t2i_flash, i2t_attention) fused the
two cross-attentions separately, but `keys` still made ~4 HBM round trips per
layer and q_img one more. `two_way_layer_fused` makes the whole layer ONE
kernel with grid (B/G,): each step loads G candidates' keys into VMEM once,
runs every stage of the layer — including all token-side ops — and writes
keys back once.

`two_way_stack_fused` goes further: BOTH layers + the final token->image
attention + norm_final in a single kernel, so each candidate's keys cross HBM
exactly once in (store read) and once out (for the upscale tail). Measured
motivation (round 3): a pure COPY kernel with the per-layer kernel's block
structure costs the same wall time as the full layer kernel — every GEMM
ablation (packed img projection, o2, flash logit/AV) moves end-to-end time
<3%. The per-layer kernels are DMA-bound, not compute-bound, so the only
remaining lever is keys traffic, which stacking cuts from 5 HBM passes
(l1 RW, l2 RW, final read) to 2. [The round-2 "whole-transformer fusion is
20% slower" negative result predates the scoped-VMEM raise: it ran under the
16 MB default and had to shrink row tiles to 512; with the 100 MB budget the
stack keeps TILE=1024 and G=4.]

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
kernels raise `vmem_limit_bytes` accordingly.

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

# Scheduling experiment knobs, A/B-able on-chip via tools/decode_bench.py.
# The layer kernel's measured per-step cost is DMA(16 MB keys in+out) +
# compute SERIAL — these probe whether Mosaic can be told to overlap them:
# `dimension_semantics=("parallel",)` declares grid steps independent;
# `cost_estimate=True` attaches a pl.CostEstimate so the scheduler knows the
# body's FLOP/byte mix.
KERNEL_OPTS = {
    "dimension_semantics": None,  # e.g. ("parallel",) or ("arbitrary",)
    "cost_estimate": False,
}


def _compiler_params(vmem_limit: int) -> "pltpu.CompilerParams":
    sem = KERNEL_OPTS.get("dimension_semantics")
    if sem is not None:
        return pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit, dimension_semantics=sem
        )
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)


def _cost_estimate(G: int, N: int, C: int, I: int, n_layers: int = 1):
    """Approximate per-call cost of the fused layer (grid total): the image
    side dominates — per candidate per layer, the packed [N,C]x[C,3I]
    projection (2*N*C*3I), the o2 [N,I]x[I,C] projection (2*N*I*C), the i2t
    logits/AV GEMMs (~4*N*I*64), and the keys round trip (2*N*C bf16 each
    way)."""
    if not KERNEL_OPTS.get("cost_estimate"):
        return None
    per_cand = 2 * N * C * 3 * I + 2 * N * I * C + 4 * N * I * 64
    return pl.CostEstimate(
        flops=int(per_cand * G * n_layers),
        bytes_accessed=int(G * (2 * N * C * 2) * n_layers + 8 * 1024 * 1024),
        transcendentals=int(G * N * 64 * 2 * n_layers),
    )

# VMEM ref bundles (ordering contract between the arg builders and kernels)
_LAYER_REF_NAMES = (
    # shared image-side constants (same block every step -> fetched once)
    "kpe",  # [N, I] t2i.k_proj(key_pe), no bias
    "qpe_img",  # [N, I] i2t.q_proj(key_pe), no bias
    "w_img",  # [C, 3I] packed (t2i.k | t2i.v | i2t.q) image projections
    "b_img",  # [1, 3I]
    # token self-attention (full dim C, head_dim C/H)
    "wq_s", "bq_s", "wk_s", "bk_s", "wv_s", "bv_s", "wo_s", "bo_s",
    # layer norms
    "ln1_s", "ln1_b", "ln2_s", "ln2_b", "ln3_s", "ln3_b", "ln4_s", "ln4_b",
    # t2i token query + output projection
    "wq_t", "bq_t", "wo_t", "bo_t",
    # token MLP
    "w1", "b1", "w2", "b2",
    # i2t token key/value + output projection
    "wk_i", "bk_i", "wv_i", "bv_i", "wo_i", "bo_i",
)
_FINAL_REF_NAMES = (
    "kpe_f",  # [N, I] final.k_proj(key_pe), no bias
    "wkv_f",  # [C, 2I] packed (final.k | final.v) image projections
    "bkv_f",  # [1, 2I]
    "wq_f", "bq_f", "wo_f", "bo_f",  # token query + output projection
    "nf_s", "nf_b",  # norm_final
)
_CONST_REF_NAMES = ("sel", "selt", "mask_c", "mask_i", "pb_tok", "pb_ht", "g")


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


def _layer_body(
    x_tok: jax.Array,  # [G*T, C] fp32 current token state
    qpe_t: jax.Array,  # [G*T, C] fp32 token positional prompts
    w: dict,  # _LAYER_REF_NAMES -> VMEM refs
    consts: dict,  # _CONST_REF_NAMES -> VMEM refs
    read_rows,  # (c, i) -> [TILE, C] current keys tile (dtype dt)
    write_rows,  # (c, i, z_fp32) -> stores the layer's updated keys tile
    *,
    G: int,
    n_tiles: int,
    skip_pe: bool,
    eps: float,
    self_scale: float,
    cross_scale: float,
    dt,
) -> jax.Array:
    """One TwoWayAttentionBlock over VMEM-resident operands; returns the new
    token state and emits updated keys tiles through ``write_rows``."""
    sel = consts["sel"][:]
    selt = consts["selt"][:]
    mask_c = consts["mask_c"][:]
    mask_i = consts["mask_i"][:]
    g = consts["g"][:]
    GHT = sel.shape[0]
    HT = GHT // G

    # ------------------------------------------------------------------
    # 1) token self-attention (+ residual unless skip_pe) + LN1, batched
    #    over the G candidates; the candidate-block-diag pb_tok mask kills
    #    cross-candidate logits before the softmax
    # ------------------------------------------------------------------
    qin = x_tok if skip_pe else x_tok + qpe_t
    q_s = (_dot(qin.astype(dt), w["wq_s"][:]) + w["bq_s"][:]) * self_scale
    k_s = _dot(qin.astype(dt), w["wk_s"][:]) + w["bk_s"][:]
    v_s = _dot(x_tok.astype(dt), w["wv_s"][:]) + w["bv_s"][:]
    qblk = (_dot(sel, q_s.astype(dt)) * mask_c).astype(dt)  # [G*HT, C]
    l_s = _dot_t(qblk, k_s.astype(dt)) + consts["pb_tok"][:]  # [G*HT, G*T]
    e_s = jnp.exp(l_s - jnp.max(l_s, axis=-1, keepdims=True))
    a_s = (e_s / jnp.sum(e_s, axis=-1, keepdims=True)).astype(dt)
    av_s = _dot(a_s, v_s.astype(dt))  # [G*HT, C] full-lane per (g, h, t) rows
    sa = _dot(selt, (av_s * mask_c).astype(dt))  # [G*T, C] head collapse
    sa = _dot(sa.astype(dt), w["wo_s"][:]) + w["bo_s"][:]
    x_tok = sa if skip_pe else x_tok + sa
    x_tok = _ln_rows(x_tok, w["ln1_s"][:], w["ln1_b"][:], eps)

    # ------------------------------------------------------------------
    # 2) token -> image cross-attention over row tiles (flash accumulation);
    #    the q projection + head unroll run batched, the tile streaming runs
    #    per candidate (each candidate attends only to its own keys)
    # ------------------------------------------------------------------
    q_t = (_dot((x_tok + qpe_t).astype(dt), w["wq_t"][:]) + w["bq_t"][:]) * cross_scale
    qblk_t = (_dot(sel, q_t.astype(dt)) * mask_i).astype(dt)  # [G*HT, I]

    kv_w = w["w_img"][:]
    kv_b = w["b_img"][:]
    I = mask_i.shape[1]
    q_img_tiles = [[None] * n_tiles for _ in range(G)]
    t2i_blks = []
    for c in range(G):
        qb_c = qblk_t[c * HT : (c + 1) * HT]  # [HT, I] sublane-aligned slice
        m_acc = jnp.full((HT, 1), -1e30, jnp.float32)
        d_acc = jnp.zeros((HT, 1), jnp.float32)
        av_acc = jnp.zeros((HT, I), jnp.float32)
        for i in range(n_tiles):
            rows = read_rows(c, i)  # [TILE, C] dt
            imgp = _dot(rows, kv_w) + kv_b  # [TILE, 3I] fp32
            k_t = (imgp[:, :I] + w["kpe"][pl.ds(i * _TILE, _TILE), :]).astype(dt)
            v_t = imgp[:, I : 2 * I].astype(dt)
            q_img_tiles[c][i] = (
                imgp[:, 2 * I :] + w["qpe_img"][pl.ds(i * _TILE, _TILE), :]
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
    x_tok = x_tok + _dot(t2i_out.astype(dt), w["wo_t"][:]) + w["bo_t"][:]
    x_tok = _ln_rows(x_tok, w["ln2_s"][:], w["ln2_b"][:], eps)

    # ------------------------------------------------------------------
    # 3) token MLP (ReLU) + LN3, batched
    # ------------------------------------------------------------------
    h = jnp.maximum(_dot(x_tok.astype(dt), w["w1"][:]) + w["b1"][:], 0.0)
    x_tok = x_tok + _dot(h.astype(dt), w["w2"][:]) + w["b2"][:]
    x_tok = _ln_rows(x_tok, w["ln3_s"][:], w["ln3_b"][:], eps)

    # ------------------------------------------------------------------
    # 4) image -> token cross-attention + LN4, tile-local per candidate
    # ------------------------------------------------------------------
    k_i = _dot((x_tok + qpe_t).astype(dt), w["wk_i"][:]) + w["bk_i"][:]
    v_i = _dot(x_tok.astype(dt), w["wv_i"][:]) + w["bv_i"][:]
    kblk = ((_dot(sel, k_i.astype(dt)) * mask_i)).astype(dt)  # [G*HT, I]
    vblk = ((_dot(sel, v_i.astype(dt)) * mask_i)).astype(dt)  # [G*HT, I]
    wo_i = w["wo_i"][:]
    bo_i = w["bo_i"][:]
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
    pb_ht = consts["pb_ht"][:]
    rl = (pb_ht > -1.0).astype(jnp.float32)  # [1, HT] real-lane mask
    counts = _dot(rl.astype(dt), g.astype(dt))  # [1, HT]: real lanes per head
    for c in range(G):
        kb_c = kblk[c * HT : (c + 1) * HT]
        vb_c = vblk[c * HT : (c + 1) * HT]
        for i in range(n_tiles):
            q_img = q_img_tiles[c][i]  # [TILE, I] dt
            l2 = _dot_t((q_img.astype(jnp.float32) * cross_scale).astype(dt), kb_c)
            l2 = l2 + pb_ht  # [TILE, HT]
            m2 = _dot((l2 * rl).astype(dt), g.astype(dt)) / counts  # per-head mean
            e2 = jnp.exp(l2 - m2)
            d2 = _dot(e2.astype(dt), g.astype(dt))  # per-head normalizer
            a2 = (e2 / d2).astype(dt)
            av2 = _dot(a2, vb_c)  # [TILE, I] disjoint per-head lanes
            o2 = _dot(av2.astype(dt), wo_i) + bo_i  # [TILE, C]
            rows = read_rows(c, i).astype(jnp.float32)
            z = _ln_rows(rows + o2, w["ln4_s"][:], w["ln4_b"][:], eps)
            write_rows(c, i, z)
    return x_tok


def _final_body(
    x_tok: jax.Array,  # [G*T, C] fp32 token state after the last layer
    qpe_t: jax.Array,  # [G*T, C] fp32
    w: dict,  # _FINAL_REF_NAMES -> VMEM refs
    consts: dict,
    read_rows,  # (c, i) -> [TILE, C] final keys tile
    *,
    G: int,
    n_tiles: int,
    eps: float,
    cross_scale: float,
    dt,
) -> jax.Array:
    """Final token->image attention + out_proj + residual + norm_final
    (transformer.py final attn; keys are read-only here)."""
    sel = consts["sel"][:]
    selt = consts["selt"][:]
    mask_i = consts["mask_i"][:]
    GHT = sel.shape[0]
    HT = GHT // G
    I = mask_i.shape[1]

    q_t = (_dot((x_tok + qpe_t).astype(dt), w["wq_f"][:]) + w["bq_f"][:]) * cross_scale
    qblk_t = (_dot(sel, q_t.astype(dt)) * mask_i).astype(dt)  # [G*HT, I]
    kv_w = w["wkv_f"][:]
    kv_b = w["bkv_f"][:]
    blks = []
    for c in range(G):
        qb_c = qblk_t[c * HT : (c + 1) * HT]
        m_acc = jnp.full((HT, 1), -1e30, jnp.float32)
        d_acc = jnp.zeros((HT, 1), jnp.float32)
        av_acc = jnp.zeros((HT, I), jnp.float32)
        for i in range(n_tiles):
            rows = read_rows(c, i)
            imgp = _dot(rows, kv_w) + kv_b  # [TILE, 2I] fp32
            k_t = (imgp[:, :I] + w["kpe_f"][pl.ds(i * _TILE, _TILE), :]).astype(dt)
            v_t = imgp[:, I:].astype(dt)
            l_t = _dot_t(qb_c, k_t)  # [HT, TILE]
            m_new = jnp.maximum(m_acc, jnp.max(l_t, axis=-1, keepdims=True))
            alpha = jnp.exp(m_acc - m_new)
            e_t = jnp.exp(l_t - m_new)
            av_acc = av_acc * alpha + _dot(e_t.astype(dt), v_t)
            d_acc = d_acc * alpha + jnp.sum(e_t, axis=-1, keepdims=True)
            m_acc = m_new
        blks.append(av_acc / d_acc)
    blk = jnp.concatenate(blks, axis=0)  # [G*HT, I]
    out = _dot(selt, (blk * mask_i).astype(dt))  # [G*T, I]
    x_tok = x_tok + _dot(out.astype(dt), w["wo_f"][:]) + w["bo_f"][:]
    return _ln_rows(x_tok, w["nf_s"][:], w["nf_b"][:], eps)


def _kernel(
    tokens_ref,  # [G, T, C] current token state
    qpe_tok_ref,  # [G, T, C] token positional prompts (the initial tokens)
    *refs,
    G: int,
    skip_pe: bool,
    eps: float,
    self_scale: float,
    cross_scale: float,
    idx_smem=None,  # SMEM int32 [B] store row per candidate (prefetch)
    scale_smem=None,  # SMEM fp32 [S] per-store-row dequant scales (prefetch)
):
    quantized = scale_smem is not None
    keys_refs = refs[:G]  # G x [1, N, C] per-candidate image activations
    rest = refs[G:]
    nL = len(_LAYER_REF_NAMES)
    w = dict(zip(_LAYER_REF_NAMES, rest[:nL]))
    consts = dict(zip(_CONST_REF_NAMES, rest[nL : nL + len(_CONST_REF_NAMES)]))
    keys_out_ref, tokens_out_ref = rest[nL + len(_CONST_REF_NAMES) :]

    dt = tokens_ref.dtype if quantized else keys_refs[0].dtype
    C = tokens_ref.shape[2]
    GT = G * _T
    x_tok = tokens_ref[...].reshape(GT, C).astype(jnp.float32)
    qpe_t = qpe_tok_ref[...].reshape(GT, C).astype(jnp.float32)
    n_tiles = keys_refs[0].shape[1] // _TILE

    def read_rows(c, i):
        r = keys_refs[c][0, pl.ds(i * _TILE, _TILE), :]
        if quantized:
            # dequantize the int8 tile in VMEM: the per-row scale comes off
            # SMEM (scale_smem[idx_smem[step*G+c]]), fp32 multiply, then
            # round to the compute dtype (identical rounding to an XLA-side
            # dequantized store — parity-tested)
            sc = scale_smem[idx_smem[pl.program_id(0) * G + c]]
            return (r.astype(jnp.float32) * sc).astype(dt)
        return r

    def write_rows(c, i, z):
        keys_out_ref[c, pl.ds(i * _TILE, _TILE), :] = z.astype(keys_out_ref.dtype)

    x_tok = _layer_body(
        x_tok, qpe_t, w, consts, read_rows, write_rows,
        G=G, n_tiles=n_tiles, skip_pe=skip_pe, eps=eps,
        self_scale=self_scale, cross_scale=cross_scale, dt=dt,
    )
    tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)


def _dma_kernel(
    tokens_ref,  # [G, T, C] current token state (auto-pipelined VMEM block)
    qpe_tok_ref,  # [G, T, C]
    *refs,
    G: int,
    nsteps: int,
    skip_pe: bool,
    eps: float,
    self_scale: float,
    cross_scale: float,
    idx_smem,  # SMEM int32 [B] store row per candidate (scalar prefetch)
    scale_smem=None,  # SMEM fp32 [S] per-row dequant scales (int8 store)
):
    """The fused layer with MANUAL double-buffered keys DMA.

    The production `_kernel` leaves keys pipelining to Mosaic, and the
    measured per-step cost is DMA(keys in+out) + compute SERIAL — neither
    `dimension_semantics` nor a CostEstimate unlocks overlap (negative
    result #6). Here keys stay in HBM (`ANY` memory space) and the kernel
    itself issues `pltpu.make_async_copy`s: group i+1's G candidate rows
    start fetching into the alternate VMEM slot BEFORE group i's body runs,
    and group i's updated rows drain back to HBM asynchronously while group
    i+1 computes, so the ~39 us/step keys traffic can hide under the ~22 us
    body (and vice versa).
    """
    quantized = scale_smem is not None
    keys_hbm = refs[0]  # [S, N, C] candidate store (or batch w/ iota idx)
    rest = refs[1:]
    nL = len(_LAYER_REF_NAMES)
    w = dict(zip(_LAYER_REF_NAMES, rest[:nL]))
    consts = dict(zip(_CONST_REF_NAMES, rest[nL : nL + len(_CONST_REF_NAMES)]))
    keys_out_hbm, tokens_out_ref, kin, kout, sem_in, sem_out = rest[
        nL + len(_CONST_REF_NAMES) :
    ]

    dt = tokens_ref.dtype if quantized else keys_hbm.dtype
    C = tokens_ref.shape[2]
    GT = G * _T
    N = kin.shape[2]
    n_tiles = N // _TILE
    i = pl.program_id(0)

    def in_copy(j, g):
        return pltpu.make_async_copy(
            keys_hbm.at[idx_smem[j * G + g]],
            kin.at[j % 2, g],
            sem_in.at[j % 2, g],
        )

    def out_copy(j):
        return pltpu.make_async_copy(
            kout.at[j % 2],
            keys_out_hbm.at[pl.ds(j * G, G)],
            sem_out.at[j % 2],
        )

    @pl.when(i == 0)
    def _warmup():
        for g in range(G):
            in_copy(0, g).start()

    @pl.when(i + 1 < nsteps)
    def _prefetch_next():
        for g in range(G):
            in_copy(i + 1, g).start()

    # the out-DMA issued two steps ago used THIS slot — drain before rewrite
    @pl.when(i >= 2)
    def _free_out_slot():
        out_copy(i - 2).wait()

    for g in range(G):
        in_copy(i, g).wait()

    slot = i % 2
    x_tok = tokens_ref[...].reshape(GT, C).astype(jnp.float32)
    qpe_t = qpe_tok_ref[...].reshape(GT, C).astype(jnp.float32)

    def read_rows(c, t):
        r = kin[slot, c, pl.ds(t * _TILE, _TILE), :]
        if quantized:
            sc = scale_smem[idx_smem[i * G + c]]
            return (r.astype(jnp.float32) * sc).astype(dt)
        return r

    def write_rows(c, t, z):
        kout[slot, c, pl.ds(t * _TILE, _TILE), :] = z.astype(kout.dtype)

    x_tok = _layer_body(
        x_tok, qpe_t, w, consts, read_rows, write_rows,
        G=G, n_tiles=n_tiles, skip_pe=skip_pe, eps=eps,
        self_scale=self_scale, cross_scale=cross_scale, dt=dt,
    )
    tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)

    out_copy(i).start()

    @pl.when(i == nsteps - 1)
    def _drain():
        out_copy(i).wait()

    if nsteps >= 2:
        # step nsteps-2's out-DMA is only covered by the i>=2 rule up to
        # step nsteps-1's OTHER slot — drain it explicitly at the end
        @pl.when(i == nsteps - 1)
        def _drain_prev():
            out_copy(i - 1).wait()


def two_way_layer_dma(
    lp,
    tokens: jax.Array,  # [B, n_tok, C]
    qpe_tok: jax.Array,  # [B, n_tok, C]
    keys: jax.Array,  # [B, N, C] batch or STORE [S, N, C] (with keys_idx)
    kpe: jax.Array,  # [N, I]
    qpe_img: jax.Array,  # [N, I]
    num_heads: int,
    skip_pe: bool,
    eps: float = 1e-5,
    keys_idx: jax.Array = None,
    keys_scale: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """`two_way_layer_fused` with manual double-buffered keys DMA (see
    `_dma_kernel`). Same contract; without ``keys_idx`` the batch is treated
    as a store with identity indices (one code path)."""
    B, n_tok, C = tokens.shape
    N = keys.shape[1]
    quantized = keys_scale is not None
    if quantized:
        assert keys_idx is not None and keys.dtype == jnp.int8
        dt = tokens.dtype
    else:
        dt = keys.dtype
    I = lp["cross_attn_t2i"]["q_proj"]["w"].shape[-1]
    assert N % _TILE == 0 and n_tok <= _T
    if keys_idx is None:
        keys_idx = jnp.arange(B, dtype=jnp.int32)
    else:
        assert keys_idx.shape == (B,) and keys.shape[2] == C

    G = max(gg for gg in (_GROUP, 2, 1) if B % gg == 0)
    nsteps = B // G

    pad = _T - n_tok
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        qpe_tok = jnp.pad(qpe_tok, ((0, 0), (0, pad), (0, 0)))

    consts = _constants(num_heads, C, I, n_tok, dt, G)
    self_scale = 1.0 / float(np.sqrt(C // num_heads))
    cross_scale = 1.0 / float(np.sqrt(I // num_heads))

    args = [
        tokens, qpe_tok, keys,
        *_layer_arg_arrays(lp, kpe, qpe_img, dt),
        *consts,
    ]
    n_pref = 2 if quantized else 1
    grp3 = lambda *shape: pl.BlockSpec(
        shape, lambda i, *ps: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cdim = lambda *shape: pl.BlockSpec(
        shape, lambda i, *ps: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        grp3(G, tokens.shape[1], C),
        grp3(G, qpe_tok.shape[1], C),
        pl.BlockSpec(memory_space=pl.ANY),  # keys stay in HBM
    ]
    for a in args[3:]:
        in_specs.append(cdim(*a.shape))

    kernel = functools.partial(
        _dma_kernel,
        G=G,
        nsteps=nsteps,
        skip_pe=skip_pe,
        eps=eps,
        self_scale=self_scale,
        cross_scale=cross_scale,
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, N, C), dt),
        jax.ShapeDtypeStruct((B, _T, C), dt),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),  # written by the kernel's DMA
        grp3(G, _T, C),
    )
    scratch = [
        pltpu.VMEM((2, G, N, C), keys.dtype),  # kin (int8 when quantized)
        pltpu.VMEM((2, G, N, C), dt),  # kout
        pltpu.SemaphoreType.DMA((2, G)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if quantized:
        wrapped = lambda idx_ref, scale_ref, *refs: kernel(
            *refs, idx_smem=idx_ref, scale_smem=scale_ref
        )
        pref_args = (
            keys_idx.astype(jnp.int32),
            keys_scale.reshape(-1).astype(jnp.float32),
        )
    else:
        wrapped = lambda idx_ref, *refs: kernel(*refs, idx_smem=idx_ref)
        pref_args = (keys_idx.astype(jnp.int32),)
    keys_out, tokens_out = pl.pallas_call(
        wrapped,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref,
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        compiler_params=params,
        interpret=_interpret(),
    )(*pref_args, *args)

    return tokens_out[:, :n_tok, :], keys_out


def _stack_kernel(
    tokens_ref,  # [G, T, C] initial tokens (= point embeddings)
    qpe_tok_ref,  # [G, T, C]
    *refs,
    G: int,
    eps: float,
    self_scale: float,
    cross_scale: float,
):
    keys_refs = refs[:G]
    rest = refs[G:]
    nL = len(_LAYER_REF_NAMES)
    nF = len(_FINAL_REF_NAMES)
    nC = len(_CONST_REF_NAMES)
    w1 = dict(zip(_LAYER_REF_NAMES, rest[:nL]))
    w2 = dict(zip(_LAYER_REF_NAMES, rest[nL : 2 * nL]))
    wf = dict(zip(_FINAL_REF_NAMES, rest[2 * nL : 2 * nL + nF]))
    consts = dict(zip(_CONST_REF_NAMES, rest[2 * nL + nF : 2 * nL + nF + nC]))
    keys_out_ref, tokens_out_ref, scratch_ref = rest[2 * nL + nF + nC :]

    dt = keys_refs[0].dtype
    C = tokens_ref.shape[2]
    GT = G * _T
    x_tok = tokens_ref[...].reshape(GT, C).astype(jnp.float32)
    qpe_t = qpe_tok_ref[...].reshape(GT, C).astype(jnp.float32)
    n_tiles = keys_refs[0].shape[1] // _TILE

    # layer 1: read from the HBM-fetched blocks; the inter-layer keys state
    # goes into a fixed VMEM SCRATCH ref (Python-value tiles measured ~10
    # us/candidate slower — Mosaic physically copies long-lived values when
    # buffers rotate; a scratch allocation is stable storage)
    def read_l1(c, i):
        return keys_refs[c][0, pl.ds(i * _TILE, _TILE), :]

    def write_l1(c, i, z):
        scratch_ref[c, pl.ds(i * _TILE, _TILE), :] = z.astype(dt)

    x_tok = _layer_body(
        x_tok, qpe_t, w1, consts, read_l1, write_l1,
        G=G, n_tiles=n_tiles, skip_pe=True, eps=eps,
        self_scale=self_scale, cross_scale=cross_scale, dt=dt,
    )

    # layer 2: read the scratch; its stage-4 output is the final keys
    # state — write it straight to the output block (a readable VMEM ref),
    # which the final attention then consumes
    def read_l2(c, i):
        return scratch_ref[c, pl.ds(i * _TILE, _TILE), :]

    def write_l2(c, i, z):
        keys_out_ref[c, pl.ds(i * _TILE, _TILE), :] = z.astype(keys_out_ref.dtype)

    x_tok = _layer_body(
        x_tok, qpe_t, w2, consts, read_l2, write_l2,
        G=G, n_tiles=n_tiles, skip_pe=False, eps=eps,
        self_scale=self_scale, cross_scale=cross_scale, dt=dt,
    )

    def read_final(c, i):
        return keys_out_ref[c, pl.ds(i * _TILE, _TILE), :]

    x_tok = _final_body(
        x_tok, qpe_t, wf, consts, read_final,
        G=G, n_tiles=n_tiles, eps=eps, cross_scale=cross_scale, dt=dt,
    )
    tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)


def _grid_kernel(
    tokens_ref,  # [G, T, C] initial tokens (= point embeddings)
    qpe_tok_ref,  # [G, T, C]
    *refs,
    G: int,
    eps: float,
    self_scale: float,
    cross_scale: float,
):
    """Both layers + final attention with the LAYER as a grid dimension.

    Grid (B/G, 2), layer index innermost. Per step only ONE layer's ops
    execute (`pl.when` on program_id(1)) — the per-step schedule stays the
    single-layer kernel's — while keys cross HBM exactly once in and once
    out like the stack kernel: the keys input block index ignores the layer
    dim (fetched once per candidate group), layer 1 writes the inter-layer
    state into the (revisited, VMEM-resident) output block, and layer 2 +
    the final attention read/update it in place before the single flush.
    Token state flows through the revisited tokens output block (bf16 —
    the same dtype round trip the per-layer kernels take through HBM).
    """
    keys_refs = refs[:G]
    rest = refs[G:]
    nL = len(_LAYER_REF_NAMES)
    nF = len(_FINAL_REF_NAMES)
    nC = len(_CONST_REF_NAMES)
    w1 = dict(zip(_LAYER_REF_NAMES, rest[:nL]))
    w2 = dict(zip(_LAYER_REF_NAMES, rest[nL : 2 * nL]))
    wf = dict(zip(_FINAL_REF_NAMES, rest[2 * nL : 2 * nL + nF]))
    consts = dict(zip(_CONST_REF_NAMES, rest[2 * nL + nF : 2 * nL + nF + nC]))
    keys_out_ref, tokens_out_ref = rest[2 * nL + nF + nC :]

    lid = pl.program_id(1)
    dt = keys_refs[0].dtype
    C = tokens_ref.shape[2]
    GT = G * _T
    n_tiles = keys_refs[0].shape[1] // _TILE
    qpe_t = qpe_tok_ref[...].reshape(GT, C).astype(jnp.float32)

    def read_in(c, i):
        return keys_refs[c][0, pl.ds(i * _TILE, _TILE), :]

    def read_out(c, i):
        return keys_out_ref[c, pl.ds(i * _TILE, _TILE), :]

    def write_out(c, i, z):
        keys_out_ref[c, pl.ds(i * _TILE, _TILE), :] = z.astype(keys_out_ref.dtype)

    @pl.when(lid == 0)
    def _layer1():
        x_tok = tokens_ref[...].reshape(GT, C).astype(jnp.float32)
        x_tok = _layer_body(
            x_tok, qpe_t, w1, consts, read_in, write_out,
            G=G, n_tiles=n_tiles, skip_pe=True, eps=eps,
            self_scale=self_scale, cross_scale=cross_scale, dt=dt,
        )
        tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)

    @pl.when(lid == 1)
    def _layer2_and_final():
        x_tok = tokens_out_ref[...].reshape(GT, C).astype(jnp.float32)
        x_tok = _layer_body(
            x_tok, qpe_t, w2, consts, read_out, write_out,
            G=G, n_tiles=n_tiles, skip_pe=False, eps=eps,
            self_scale=self_scale, cross_scale=cross_scale, dt=dt,
        )
        x_tok = _final_body(
            x_tok, qpe_t, wf, consts, read_out,
            G=G, n_tiles=n_tiles, eps=eps, cross_scale=cross_scale, dt=dt,
        )
        tokens_out_ref[...] = x_tok.astype(tokens_out_ref.dtype).reshape(G, _T, C)


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


def _layer_arg_arrays(lp, kpe, qpe_img, dt):
    """The per-layer weight operands, ordered as _LAYER_REF_NAMES."""
    t2i, i2t, sa = lp["cross_attn_t2i"], lp["cross_attn_i2t"], lp["self_attn"]
    w_img = jnp.concatenate(
        [t2i["k_proj"]["w"], t2i["v_proj"]["w"], i2t["q_proj"]["w"]], axis=1
    ).astype(dt)
    b_img = jnp.concatenate(
        [t2i["k_proj"]["b"], t2i["v_proj"]["b"], i2t["q_proj"]["b"]]
    ).reshape(1, -1).astype(jnp.float32)
    mlp = lp["mlp"]
    return [
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
    ]


def _final_arg_arrays(fa, norm_final, kpe_f, dt):
    """The final-attention operands, ordered as _FINAL_REF_NAMES."""
    wkv = jnp.concatenate([fa["k_proj"]["w"], fa["v_proj"]["w"]], axis=1).astype(dt)
    bkv = jnp.concatenate([fa["k_proj"]["b"], fa["v_proj"]["b"]]).reshape(1, -1).astype(jnp.float32)
    return [
        kpe_f.astype(dt), wkv, bkv,
        fa["q_proj"]["w"].astype(dt), _bias2d(fa["q_proj"]["b"], jnp.float32),
        fa["out_proj"]["w"].astype(dt), _bias2d(fa["out_proj"]["b"], jnp.float32),
        _bias2d(norm_final["scale"]), _bias2d(norm_final["bias"]),
    ]


def _specs_and_group(B, n_tok, N, C, prefetch, G):
    """Common BlockSpec builders: cdim (whole-operand constants), grp3
    (G-grouped batch blocks), and the G per-candidate keys specs. With
    ``prefetch`` the index_maps gain the scalar-prefetch refs as trailing
    args (one int32 idx ref; int8 stores add a second fp32 scales ref —
    ``*ps`` absorbs either arity)."""
    if prefetch:
        cdim = lambda *shape: pl.BlockSpec(
            shape, lambda i, *ps: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        grp3 = lambda *shape: pl.BlockSpec(
            shape, lambda i, *ps: (i, 0, 0), memory_space=pltpu.VMEM
        )
        keys_specs = [
            pl.BlockSpec(
                (1, N, C), lambda i, *ps, g=g: (ps[0][i * G + g], 0, 0),
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
    return cdim, grp3, keys_specs


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
    keys_scale: jax.Array = None,  # optional fp32 [S]: keys is an int8 store;
    # row s dequantizes as keys[s] * keys_scale[s] (requires keys_idx)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens', keys') — one fused TwoWayAttentionBlock.

    With ``keys_idx``, ``keys`` is a candidate STORE and the G keys blocks of
    grid step i read rows ``keys_idx[i*G+g]`` directly via scalar-prefetch
    block indexing — the batched gather (which XLA lowers to a slice loop +
    a full layout-fix copy, ~13 ms per 1024 candidates traced) never
    materializes.

    With ``keys_scale``, the store is int8 per-candidate-row symmetric
    quantized: each keys tile dequantizes in VMEM right after its (4x
    smaller) DMA. Updated keys are written back at the compute dtype, so
    only this first layer sees int8 — 4x less store HBM per chip and ~1.5
    MB less inbound DMA per candidate on the decode hot path.
    """
    B, n_tok, C = tokens.shape
    N = keys.shape[1]
    quantized = keys_scale is not None
    if quantized:
        assert keys_idx is not None and keys.dtype == jnp.int8, (
            "int8 keys require store-indexed decode (keys_idx) — the batch "
            "path has no per-row scale plumbing"
        )
        dt = tokens.dtype
    else:
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

    consts = _constants(num_heads, C, I, n_tok, dt, G)
    self_scale = 1.0 / float(np.sqrt(C // num_heads))
    cross_scale = 1.0 / float(np.sqrt(I // num_heads))

    prefetch = keys_idx is not None
    cdim, grp3, keys_specs = _specs_and_group(B, n_tok, N, C, prefetch, G)

    args = [
        tokens, qpe_tok, *([keys] * G),
        *_layer_arg_arrays(lp, kpe, qpe_img, dt),
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
    params = _compiler_params(vmem_limit)
    cost = _cost_estimate(B, N, C, I)
    if quantized:
        # second scalar-prefetch operand: the fp32 per-row dequant scales
        # live in SMEM and are read per candidate inside the kernel
        keys_out, tokens_out = pl.pallas_call(
            lambda idx_ref, scale_ref, *refs: kernel(
                *refs, idx_smem=idx_ref, scale_smem=scale_ref
            ),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B // G,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            compiler_params=params,
            cost_estimate=cost,
            interpret=_interpret(),
        )(
            keys_idx.astype(jnp.int32),
            keys_scale.reshape(-1).astype(jnp.float32),
            *args,
        )
    elif prefetch:
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
            cost_estimate=cost,
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
            cost_estimate=cost,
            interpret=_interpret(),
        )(*args)

    # scale q AFTER t2i bias (the reference scales q post-projection): note the
    # kernel applies cross_scale to (proj + bias) jointly — identical math.
    return tokens_out[:, :n_tok, :], keys_out


def _specs_and_group_2d(N, C, prefetch, G):
    """BlockSpec builders for the (B/G, layer) 2-D grid: every index_map
    ignores the layer dim, so keys/tokens blocks are fetched once per
    candidate group and revisited (VMEM-resident) on the layer-1 step."""
    if prefetch:
        cdim = lambda *shape: pl.BlockSpec(
            shape, lambda i, l, s: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        grp3 = lambda *shape: pl.BlockSpec(
            shape, lambda i, l, s: (i, 0, 0), memory_space=pltpu.VMEM
        )
        keys_specs = [
            pl.BlockSpec(
                (1, N, C), lambda i, l, s, g=g: (s[i * G + g], 0, 0),
                memory_space=pltpu.VMEM,
            )
            for g in range(G)
        ]
    else:
        cdim = lambda *shape: pl.BlockSpec(
            shape, lambda i, l: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        grp3 = lambda *shape: pl.BlockSpec(
            shape, lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM
        )
        keys_specs = [
            pl.BlockSpec(
                (1, N, C), lambda i, l, g=g: (i * G + g, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for g in range(G)
        ]
    return cdim, grp3, keys_specs


def two_way_grid_fused(
    p,  # whole transformer params: {"layers": [l1, l2], "final_attn_t2i", "norm_final"}
    tokens: jax.Array,  # [B, n_tok, C] point embeddings
    qpe_tok: jax.Array,  # [B, n_tok, C]
    keys: jax.Array,  # [B, N, C] image embedding rows, or a STORE [S, N, C]
    kpe_layers,  # list of [N, I]: per-layer t2i.k_proj(key_pe)
    qpe_img_layers,  # list of [N, I]: per-layer i2t.q_proj(key_pe)
    kpe_final: jax.Array,  # [N, I]: final_attn.k_proj(key_pe)
    num_heads: int,
    eps: float = 1e-5,
    keys_idx: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """The depth-2 transformer with the LAYER as an inner grid dimension.

    Same HBM contract as ``two_way_stack_fused`` (keys once in, once out)
    but the per-step executed body stays ONE layer — probing whether the
    stack kernel's measured 2.4x per-step cost came from Mosaic scheduling
    the doubled unrolled body rather than from the work itself. Returns
    (queries_final, keys_final), the ``two_way_transformer`` contract.
    """
    assert len(p["layers"]) == 2, "grid kernel is specialized to depth 2"
    B, n_tok, C = tokens.shape
    N = keys.shape[1]
    dt = keys.dtype
    I = p["layers"][0]["cross_attn_t2i"]["q_proj"]["w"].shape[-1]
    assert N % _TILE == 0 and n_tok <= _T
    if keys_idx is not None:
        assert keys_idx.shape == (B,) and keys.shape[2] == C

    G = max(gg for gg in (_GROUP, 2, 1) if B % gg == 0)

    pad = _T - n_tok
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        qpe_tok = jnp.pad(qpe_tok, ((0, 0), (0, pad), (0, 0)))

    consts = _constants(num_heads, C, I, n_tok, dt, G)
    self_scale = 1.0 / float(np.sqrt(C // num_heads))
    cross_scale = 1.0 / float(np.sqrt(I // num_heads))

    prefetch = keys_idx is not None
    cdim, grp3, keys_specs = _specs_and_group_2d(N, C, prefetch, G)

    args = [
        tokens, qpe_tok, *([keys] * G),
        *_layer_arg_arrays(p["layers"][0], kpe_layers[0], qpe_img_layers[0], dt),
        *_layer_arg_arrays(p["layers"][1], kpe_layers[1], qpe_img_layers[1], dt),
        *_final_arg_arrays(p["final_attn_t2i"], p["norm_final"], kpe_final, dt),
        *consts,
    ]
    in_specs = []
    for a in args[:2]:
        in_specs.append(grp3(G, a.shape[1], a.shape[2]))
    in_specs.extend(keys_specs)
    for a in args[2 + G :]:
        in_specs.append(cdim(*a.shape))

    kernel = functools.partial(
        _grid_kernel,
        G=G,
        eps=eps,
        self_scale=self_scale,
        cross_scale=cross_scale,
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, N, C), dt),
        jax.ShapeDtypeStruct((B, _T, C), dt),
    )
    out_specs = (grp3(G, N, C), grp3(G, _T, C))
    vmem_limit = min(100, 12 + G * 22) * 1024 * 1024
    params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    if prefetch:
        keys_out, tokens_out = pl.pallas_call(
            lambda idx_ref, *refs: kernel(*refs),
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // G, 2),
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
            grid=(B // G, 2),
            in_specs=in_specs,
            out_specs=out_specs,
            compiler_params=params,
            interpret=_interpret(),
        )(*args)

    return tokens_out[:, :n_tok, :], keys_out


def two_way_stack_fused(
    p,  # whole transformer params: {"layers": [l1, l2], "final_attn_t2i", "norm_final"}
    tokens: jax.Array,  # [B, n_tok, C] point embeddings
    qpe_tok: jax.Array,  # [B, n_tok, C] (== tokens for the reference)
    keys: jax.Array,  # [B, N, C] image embedding rows, or a STORE [S, N, C]
    kpe_layers,  # list of [N, I]: per-layer t2i.k_proj(key_pe)
    qpe_img_layers,  # list of [N, I]: per-layer i2t.q_proj(key_pe)
    kpe_final: jax.Array,  # [N, I]: final_attn.k_proj(key_pe)
    num_heads: int,
    eps: float = 1e-5,
    keys_idx: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """The ENTIRE depth-2 two-way transformer (both TwoWayAttentionBlocks +
    final token->image attention + norm_final) as ONE kernel. Keys cross HBM
    exactly once in (store/batch read) and once out (for the upscale tail);
    the inter-layer keys state lives as VMEM tile values.

    Returns (queries_final [B, n_tok, C], keys_final [B, N, C]) — exactly
    ``two_way_transformer(..., fused=...)``'s contract after norm_final.
    """
    assert len(p["layers"]) == 2, "stack kernel is specialized to depth 2"
    B, n_tok, C = tokens.shape
    N = keys.shape[1]
    dt = keys.dtype
    I = p["layers"][0]["cross_attn_t2i"]["q_proj"]["w"].shape[-1]
    assert N % _TILE == 0 and n_tok <= _T
    if keys_idx is not None:
        assert keys_idx.shape == (B,) and keys.shape[2] == C

    G = max(gg for gg in (_GROUP, 2, 1) if B % gg == 0)

    pad = _T - n_tok
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        qpe_tok = jnp.pad(qpe_tok, ((0, 0), (0, pad), (0, 0)))

    consts = _constants(num_heads, C, I, n_tok, dt, G)
    self_scale = 1.0 / float(np.sqrt(C // num_heads))
    cross_scale = 1.0 / float(np.sqrt(I // num_heads))

    prefetch = keys_idx is not None
    cdim, grp3, keys_specs = _specs_and_group(B, n_tok, N, C, prefetch, G)

    args = [
        tokens, qpe_tok, *([keys] * G),
        *_layer_arg_arrays(p["layers"][0], kpe_layers[0], qpe_img_layers[0], dt),
        *_layer_arg_arrays(p["layers"][1], kpe_layers[1], qpe_img_layers[1], dt),
        *_final_arg_arrays(p["final_attn_t2i"], p["norm_final"], kpe_final, dt),
        *consts,
    ]
    in_specs = []
    for a in args[:2]:
        in_specs.append(grp3(G, a.shape[1], a.shape[2]))
    in_specs.extend(keys_specs)
    for a in args[2 + G :]:
        in_specs.append(cdim(*a.shape))

    kernel = functools.partial(
        _stack_kernel,
        G=G,
        eps=eps,
        self_scale=self_scale,
        cross_scale=cross_scale,
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, N, C), dt),
        jax.ShapeDtypeStruct((B, _T, C), dt),
    )
    out_specs = (grp3(G, N, C), grp3(G, _T, C))
    # the inter-layer keys state lives in a fixed VMEM scratch (G x N x C
    # bf16 = 2 MB per candidate) on top of the per-layer budget
    scratch = [pltpu.VMEM((G, N, C), dt)]
    vmem_limit = min(100, 12 + G * 22) * 1024 * 1024
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
                scratch_shapes=scratch,
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
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(*args)

    return tokens_out[:, :n_tok, :], keys_out
