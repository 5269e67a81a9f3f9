"""Pallas TPU kernel: image-side projections + token->image FLASH attention.

The two-way transformer's token->image cross-attention softmaxes ~6 token
queries over all 4096 image positions (reference: lib/sam_model/
transformer.py:163-168). XLA materializes k/v projections of the [B, 4096, C]
image tensor plus the logits; here one kernel streams the image tiles,
computes k/v/q projections in VMEM, and flash-accumulates the attention
(running max + rescaled sums in scratch, which persists across the
sequentially-executed TPU grid steps) — k_img and v_img never touch HBM.

Head structure is encoded block-diagonally (Mosaic-friendly, no lane
reshapes): token queries enter as Qblk[(h,t), (h,d)] so logits and the
value accumulation are plain MXU GEMMs; the cross-head garbage entries of
the [HT, I] accumulator are sliced away by the (tiny) XLA epilogue.

Two variants:
- proj_q_t2i_flash: layer version — also emits q_img (+ PE) for the
  downstream image->token attention.
- t2i_flash_kv: final-attention version (k/v only, no q output).

Forward-only (inference/retrieval paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _flash_step(j, n_tiles, k_t, v_t, qblk, m_scr, d_scr, av_scr, out_ref):
    """Shared flash-attention accumulation over one image tile."""
    HT = qblk.shape[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        d_scr[:] = jnp.zeros_like(d_scr)
        av_scr[:] = jnp.zeros_like(av_scr)

    l = jax.lax.dot_general(
        qblk,
        k_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [HT, T]
    m_old = m_scr[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(l, axis=-1, keepdims=True))  # [HT, 1]
    alpha = jnp.exp(m_old - m_new)  # [HT, 1]
    e = jnp.exp(l - m_new)  # [HT, T]
    av = jax.lax.dot_general(
        e.astype(v_t.dtype),
        v_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [HT, I]
    m_scr[:, 0:1] = m_new
    d_scr[:, 0:1] = d_scr[:, 0:1] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    av_scr[:] = av_scr[:] * alpha + av

    @pl.when(j == n_tiles - 1)
    def _():
        out_ref[0] = (av_scr[:] / d_scr[:, 0:1]).astype(out_ref.dtype)


def _kernel_layer(x_ref, wk_ref, bk_ref, wv_ref, bv_ref, wq_ref, bq_ref,
                  kpe_ref, qpe_ref, qblk_ref, q_ref, attn_ref,
                  m_scr, d_scr, av_scr):
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    x = x_ref[0]  # [T, C]

    k_t = (
        jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)
        + bk_ref[:].astype(jnp.float32)
        + kpe_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    v_t = (
        jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)
        + bv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    q_t = (
        jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)
        + bq_ref[:].astype(jnp.float32)
        + qpe_ref[:].astype(jnp.float32)
    )
    q_ref[0] = q_t.astype(q_ref.dtype)

    _flash_step(j, n_tiles, k_t, v_t, qblk_ref[0], m_scr, d_scr, av_scr, attn_ref)


def _kernel_final(x_ref, wk_ref, bk_ref, wv_ref, bv_ref, kpe_ref, qblk_ref,
                  attn_ref, m_scr, d_scr, av_scr):
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    x = x_ref[0]
    k_t = (
        jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)
        + bk_ref[:].astype(jnp.float32)
        + kpe_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    v_t = (
        jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)
        + bv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    _flash_step(j, n_tiles, k_t, v_t, qblk_ref[0], m_scr, d_scr, av_scr, attn_ref)


def _qblk(q_tok: jax.Array, num_heads: int, scale: float, dtype) -> jax.Array:
    """[B, T, I] token queries -> block-diag [B, H*T, I], pre-scaled."""
    B, T, I = q_tok.shape
    d = I // num_heads
    qt = q_tok.reshape(B, T, num_heads, d).astype(jnp.float32) * scale
    eye = jnp.eye(num_heads, dtype=jnp.float32)
    return jnp.einsum("bthd,hg->bhtgd", qt, eye).reshape(B, num_heads * T, I).astype(dtype)


def _extract_heads(attn: jax.Array, num_heads: int, T: int) -> jax.Array:
    """[B, H*T, I] accumulator -> [B, T, I] taking each row-group's own head."""
    B, HT, I = attn.shape
    d = I // num_heads
    a = attn.reshape(B, num_heads, T, num_heads, d)
    eye = jnp.eye(num_heads, dtype=attn.dtype)
    return jnp.einsum("bhtgd,hg->bthd", a, eye).reshape(B, T, I)


def _tile(n: int) -> int:
    tile = 2048
    while tile > 8 and n % tile != 0:
        tile //= 2
    assert n % tile == 0, (
        f"t2i_flash: {n} rows have no power-of-two tile divisor >= 8 — the "
        "grid would silently drop the remainder rows; use fused=False for "
        "this geometry"
    )
    return tile


@functools.partial(jax.jit, static_argnames=("num_heads",))
def proj_q_t2i_flash(
    keys: jax.Array,  # [B, N, C]
    wk, bk, wv, bv, wq, bq,  # [C, I] / [I] projection params
    kpe: jax.Array,  # [N, I] pe @ Wk (bias-free)
    qpe: jax.Array,  # [N, I] pe @ Wq
    q_tok: jax.Array,  # [B, T, I] projected token queries
    num_heads: int,
):
    """Returns (q_img [B, N, I], t2i attention output [B, T, I])."""
    B, N, C = keys.shape
    I = wk.shape[1]
    T = q_tok.shape[1]
    HT = num_heads * T
    dt = keys.dtype
    head_dim = I // num_heads
    qblk = _qblk(q_tok, num_heads, 1.0 / (head_dim**0.5), dt)
    tile = _tile(N)

    q_img, attn = pl.pallas_call(
        _kernel_layer,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, I), dt),
            jax.ShapeDtypeStruct((B, HT, I), dt),
        ),
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, I), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, I), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HT, I), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, I), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HT, I), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((HT, 128), jnp.float32),
            pltpu.VMEM((HT, 128), jnp.float32),
            pltpu.VMEM((HT, I), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        keys,
        wk.astype(dt), bk.astype(jnp.float32),
        wv.astype(dt), bv.astype(jnp.float32),
        wq.astype(dt), bq.astype(jnp.float32),
        kpe.astype(dt), qpe.astype(dt), qblk,
    )
    return q_img, _extract_heads(attn, num_heads, T)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def t2i_flash_kv(
    keys: jax.Array,  # [B, N, C]
    wk, bk, wv, bv,
    kpe: jax.Array,  # [N, I]
    q_tok: jax.Array,  # [B, T, I]
    num_heads: int,
):
    """Final-attention variant: returns the t2i attention output [B, T, I]."""
    B, N, C = keys.shape
    I = wk.shape[1]
    T = q_tok.shape[1]
    HT = num_heads * T
    dt = keys.dtype
    head_dim = I // num_heads
    qblk = _qblk(q_tok, num_heads, 1.0 / (head_dim**0.5), dt)
    tile = _tile(N)

    attn = pl.pallas_call(
        _kernel_final,
        out_shape=jax.ShapeDtypeStruct((B, HT, I), dt),
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, I), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, I), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HT, I), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HT, I), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HT, 128), jnp.float32),
            pltpu.VMEM((HT, 128), jnp.float32),
            pltpu.VMEM((HT, I), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        keys,
        wk.astype(dt), bk.astype(jnp.float32),
        wv.astype(dt), bv.astype(jnp.float32),
        kpe.astype(dt), qblk,
    )
    return _extract_heads(attn, num_heads, T)
