"""Pallas TPU kernel: fused image->token cross-attention block tail.

In the two-way transformer, the image->token cross-attention
(reference: lib/sam_model/transformer.py:175-180) attends each of the 4096
image positions to only ~6 token keys — everything is tile-local over the
image rows, so the whole sub-chain

    attn_out = out_proj( softmax(q_img @ k_tok^T / sqrt(d)) @ v_tok )
    keys'    = LayerNorm(keys + attn_out)

fuses into ONE pass over the image tensor. Mosaic has no lane-crossing
reshapes, so the per-head structure is encoded as block-diagonal operand
matrices built in XLA (tiny, per sample):

    Kblk[(h,d), (h,t)] = k_tok[t,h,d]     logits  = q_img @ Kblk
    G[(h,t), (h,t')]  = 1                 denom   = exp(l - shift) @ G
    Vblk[(h,t), (h,d)] = v_tok[t,h,d]     attnout = (e/denom) @ Vblk

The stabilizing shift is the PER-HEAD mean (one GEMM against G): any
uniform per-head shift is softmax-invariant, and unlike a global row max
it cannot underflow an entire low-logit head's exponentials to 0 (whose
normalizer would then be 0/0 = NaN). Forward-only (inference paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _kernel(q_ref, keys_ref, kblk_ref, g_ref, vblk_ref, wo_ref, bo_ref, s_ref, b_ref, o_ref, *, scale, eps):
    q = q_ref[0]  # [T, I]
    keys = keys_ref[0]  # [T, C]

    l = jnp.dot(q, kblk_ref[0], preferred_element_type=jnp.float32) * scale  # [T, HT]
    # PER-HEAD shift (the reference softmax is per-head): a GLOBAL max would
    # underflow e to 0 across an entire head whose logits sit ~88+ below
    # another head's max, zeroing its normalizer d -> NaN. Same mean-shift
    # trick as two_way_layer.py: softmax is invariant to any uniform
    # per-head shift, the per-head MEAN is one GEMM against the group-sum
    # matrix g (every column group has exactly T real columns here), and
    # d >= exp(max - mean) >= 1 can never underflow.
    g32 = g_ref[:].astype(jnp.float32)
    n_tok = jnp.float32(1.0) / jnp.sum(g32[:, 0])  # 1/T via g's column sum
    m = jnp.dot(l, g32, preferred_element_type=jnp.float32) * n_tok
    e = jnp.exp(l - m)
    d = jnp.dot(e, g32, preferred_element_type=jnp.float32)
    a = (e / d).astype(q.dtype)  # [T, HT]
    o = jnp.dot(a, vblk_ref[0], preferred_element_type=jnp.float32).astype(q.dtype)  # [T, I]
    o2 = jnp.dot(o, wo_ref[:], preferred_element_type=jnp.float32)  # [T, C]
    z = keys.astype(jnp.float32) + o2 + bo_ref[:].astype(jnp.float32)

    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=-1, keepdims=True)
    y = (z - mean) * jax.lax.rsqrt(var + eps)
    o_ref[0] = (y * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps"))
def i2t_attention_fused(
    q_img: jax.Array,  # [B, N, I] image-side queries (already projected)
    keys: jax.Array,  # [B, N, C] residual stream
    k_tok: jax.Array,  # [B, T, I] token keys (projected)
    v_tok: jax.Array,  # [B, T, I] token values (projected)
    w_out: jax.Array,  # [I, C] out projection
    b_out: jax.Array,  # [C]
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,  # [C]
    num_heads: int,
    eps: float = 1e-5,
) -> jax.Array:  # [B, N, C] = LN(keys + out_proj(attention))
    B, N, I = q_img.shape
    C = keys.shape[-1]
    T = k_tok.shape[1]
    head_dim = I // num_heads
    dt = q_img.dtype

    eye = jnp.eye(num_heads, dtype=jnp.float32)
    # Kblk[(h,d),(g,t)] = k_tok[t,h,d] * eye[h,g]
    kt = k_tok.reshape(B, T, num_heads, head_dim).astype(jnp.float32)
    kblk = jnp.einsum("bthd,hg->bhdgt", kt, eye).reshape(B, I, num_heads * T).astype(dt)
    # Vblk[(h,t),(g,d)] = v_tok[t,h,d] * eye[h,g]
    vt = v_tok.reshape(B, T, num_heads, head_dim).astype(jnp.float32)
    vblk = jnp.einsum("bthd,hg->bhtgd", vt, eye).reshape(B, num_heads * T, I).astype(dt)
    # group-sum matrix over each head's T columns
    g = jnp.einsum("hg,tu->htgu", eye, jnp.ones((T, T), jnp.float32)).reshape(
        num_heads * T, num_heads * T
    ).astype(dt)

    tile = 2048
    while tile > 8 and N % tile != 0:
        tile //= 2
    assert N % tile == 0, (
        f"i2t_attention: {N} rows have no power-of-two tile divisor >= 8 — "
        "the grid would silently drop the remainder rows; use fused=False "
        "for this geometry"
    )

    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / (head_dim**0.5), eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec((1, tile, I), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I, num_heads * T), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads * T, num_heads * T), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads * T, I), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(q_img, keys, kblk, g, vblk, w_out.astype(dt), b_out, ln_scale, ln_bias)
    return out
