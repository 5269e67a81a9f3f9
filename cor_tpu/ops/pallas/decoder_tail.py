"""Pallas TPU kernel: the mask decoder's ENTIRE upscale tail in one pass.

Reference dataflow (lib/sam_model/mask_decoder.py:53-59,132-137):

    y   = gelu(LN(conv_transpose_2x2_s2(src, W1)))   # 256ch -> 64ch, 2x up
    up  = gelu(conv_transpose_2x2_s2(y, W2))         # 64ch -> 32ch, 2x up
    m   = einsum('bnc,bhwc->bnhw', hyper, up)        # hypernetwork dot

XLA lowers this to ~10 ms for a 128-candidate batch (two transposed convs +
LN + GELUs + contraction, each a full HBM round trip over up-to-0.5 GB
intermediates). This kernel computes the whole chain per row-tile of `src`
with only one read of src and one (narrow) write of the result:

- conv_transpose 2x2/s2 == one GEMM against the kernel reshaped to
  [C, (2*2*O)] — each input pixel independently produces its 2x2 output.
- the per-upscaled-pixel LayerNorm over 64 channels becomes lane-local
  arithmetic via a block-diagonal mean matrix (Mosaic rejects lane-crossing
  reshapes, so segment reductions are expressed as GEMMs).
- the second conv and the hypernetwork contraction use block-diagonal
  weights for the same reason.

Output layout is [B, H, W, (p, q, r, s, n)] raw; the caller does the cheap
pixel-shuffle rearrange in XLA. Forward-only (inference / retrieval); the
training path keeps the differentiable XLA composition. Numerics match the
XLA path to bf16 rounding (tested, incl. an erf-polynomial exact GELU since
Mosaic lacks erf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _gelu_exact, _gelu_fast, _interpret


def _kernel(x_ref, w1_ref, b1_ref, m_ref, g1_ref, g2_ref, w2_ref, b2_ref, h_ref, o_ref, *, eps):
    # x:  [1, T, C]            input row-tile (flattened spatial)
    # w1: [C, 4*O1], b1: [4*O1]           first transposed conv, MEAN-FOLDED
    # m:  [4*O1, 4*O1]                    block-diag mean matrix (1/O1 blocks)
    # g1: [4*O1], g2: [4*O1]              LN scale/bias tiled per position
    # w2: [4*O1, 4*4*O2], b2: [4*4*O2]    second conv, block-diag
    # h:  [1, 16*O2, 16*N]                hypernetwork, block-diag per sample
    # o:  [1, T, 16*N]
    x = x_ref[0]
    # the LN mean is LINEAR in the conv output, so it is pre-folded into the
    # conv weights by the caller: w1 = w1_raw - w1_raw @ M (same for b1) and
    # this single GEMM yields z = y - mean(y) directly — one [T,C]x[C,4*O1]
    # stat GEMM (of the former two) disappears from the kernel entirely
    z = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    z = z + b1_ref[:].astype(jnp.float32)

    # grouped LayerNorm variance over each 64-channel position group, as a
    # GEMM. It runs in the INPUT dtype (bf16 on the production decode path —
    # fp32-operand matmuls run at ~1/4 the MXU bf16 rate; accumulation stays
    # fp32 via preferred_element_type): ~0.4% stat rounding, inference-only.
    var = jnp.dot((z * z).astype(x.dtype), m_ref[:], preferred_element_type=jnp.float32)
    y = z * jax.lax.rsqrt(var + eps)
    y = y * g1_ref[:].astype(jnp.float32) + g2_ref[:].astype(jnp.float32)
    # bf16 production path: polynomial GELU (the erf's exp+divide dominate
    # this kernel's VPU time); fp32 oracle paths keep the exact erf
    gelu = _gelu_fast if x.dtype == jnp.bfloat16 else _gelu_exact
    y = gelu(y)

    # w2 is block-diagonal (4 position groups of 64 in -> 128 out); a single
    # [T,256]x[256,512] GEMM runs 75% zero MACs. Two 128-aligned half GEMMs
    # (each covering 2 diagonal blocks, 50% zeros) measure ~4% faster on the
    # decode chunk; 64-wide 4-way slicing is slower (sub-register slices +
    # 64-deep contractions under-fill the MXU).
    yb = y.astype(x.dtype)
    w2 = w2_ref[:]
    hc, ho = w2.shape[0] // 2, w2.shape[1] // 2  # 2 diag blocks per half
    u0 = jnp.dot(yb[:, :hc], w2[:hc, :ho], preferred_element_type=jnp.float32)
    u1 = jnp.dot(yb[:, hc:], w2[hc:, ho:], preferred_element_type=jnp.float32)
    y = jnp.concatenate([u0, u1], axis=1)
    y = y + b2_ref[:].astype(jnp.float32)
    y = gelu(y)

    # emit TRANSPOSED [16N, T]: the row-tile lands on the 128-lane axis of the
    # output store (a [T, 16N] store would use only 16N of 128 lanes)
    m_out = jax.lax.dot_general(
        h_ref[0],  # [16O2, 16N]
        y.astype(x.dtype),  # [T, 16O2]
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [16N, T]
    o_ref[0] = m_out.astype(o_ref.dtype)


def _block_diag(blocks_shape_matrix: jax.Array, groups: int) -> jax.Array:
    """kron(eye(groups), block) for a single [a, b] block."""
    a, b = blocks_shape_matrix.shape
    eye = jnp.eye(groups, dtype=blocks_shape_matrix.dtype)
    return jnp.einsum("gh,ab->gahb", eye, blocks_shape_matrix).reshape(
        groups * a, groups * b
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_decoder_tail(
    src: jax.Array,  # [B, H, W, C] decoder image embedding (C=256)
    w1: jax.Array,  # [C, 2, 2, O1] convT1 kernel (einsum layout)
    b1: jax.Array,  # [O1]
    ln_scale: jax.Array,  # [O1]
    ln_bias: jax.Array,  # [O1]
    w2: jax.Array,  # [O1, 2, 2, O2] convT2 kernel
    b2: jax.Array,  # [O2]
    hyper: jax.Array,  # [B, N, O2]
    eps: float = 1e-6,
) -> jax.Array:  # [B, N, 4H, 4W] float32 mask logits
    B, H, W, C = src.shape
    O1 = w1.shape[-1]
    O2 = w2.shape[-1]
    N = hyper.shape[1]
    dt = src.dtype

    mean_f32 = _block_diag(jnp.full((O1, O1), 1.0 / O1, jnp.float32), 4)
    # fold the (linear) LN mean into the conv weights: z = y - mean(y) =
    # x @ (w1 - w1 @ M) + (b1 - b1 @ M); composed in fp32, cast once
    w1f = w1.reshape(C, 4 * O1).astype(jnp.float32)
    w1r = (w1f - w1f @ mean_f32).astype(dt)
    b1f = jnp.tile(b1.astype(jnp.float32), 4)
    b1t = b1f - b1f @ mean_f32
    mean_m = mean_f32.astype(dt)
    g1 = jnp.tile(ln_scale.astype(jnp.float32), 4)
    g2 = jnp.tile(ln_bias.astype(jnp.float32), 4)
    w2blk = _block_diag(w2.reshape(O1, 4 * O2).astype(jnp.float32), 4).astype(dt)
    b2t = jnp.tile(b2.astype(jnp.float32), 16)
    hyper_t = jnp.swapaxes(hyper, 1, 2).astype(jnp.float32)  # [B, O2, N]
    eye16 = jnp.eye(16, dtype=jnp.float32)
    h_blk = jnp.einsum("gh,bon->bgohn", eye16, hyper_t).reshape(
        B, 16 * O2, 16 * N
    ).astype(dt)

    n_rows = H * W
    x2 = src.reshape(B, n_rows, C)
    tile = 2048
    while tile > 8 and n_rows % tile != 0:
        tile //= 2
    assert n_rows % tile == 0, (
        f"decoder_tail: {n_rows} rows have no power-of-two tile divisor >= 8 "
        "— the grid would silently skip the remainder pixels; use "
        "fused=False for this geometry"
    )

    raw = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, 16 * N, n_rows), jnp.float32),
        grid=(B, n_rows // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4 * O1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O1,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O1, 4 * O1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O1,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O1,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O1, 16 * O2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * O2,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 * O2, 16 * N), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 16 * N, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x2, w1r, b1t, mean_m, g1, g2, w2blk, b2t, h_blk)

    # raw is [B, (p, q, r, s, n), H*W]; output pixel (4i+2p+r, 4j+2q+s) —
    # pure transpose + reshape, fused by XLA
    m = raw.reshape(B, 2, 2, 2, 2, N, H, W)
    m = m.transpose(0, 5, 6, 1, 3, 7, 2, 4)  # [B, N, H, p, r, W, q, s]
    return m.reshape(B, N, 4 * H, 4 * W)
