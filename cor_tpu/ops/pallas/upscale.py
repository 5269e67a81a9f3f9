"""Pallas TPU kernel: fused final-upscale + hypernetwork mask projection.

The mask decoder's tail is
    up    = gelu(conv_transpose_2x2(x))          # [B, 4H, 4W, 32]
    masks = einsum('bnc,bhwc->bnhw', hyper, up)  # [B, n, 4H, 4W]
(reference: lib/sam_model/mask_decoder.py:53-59,135-137). At retrieval batch
sizes the intermediate `up` is ~0.5 GB and crosses HBM twice. This kernel
fuses the three steps: each grid step loads a row-tile of x, runs the 2x2
stride-2 transposed conv as one MXU GEMM (kernel reshaped to [C, 2*2*O]),
applies GELU, contracts against the per-sample hypernetwork weights in VMEM,
and writes only the [n, rows*2, W*2] mask tile.

Forward-only; superseded on the hot path by ops/pallas/decoder_tail (which
fuses the ENTIRE upscale chain) — kept as the simpler reference kernel and
for its shared helpers (_interpret, _erf, _gelu_exact). Falls back to
interpreter mode off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x: jax.Array) -> jax.Array:
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7 — far below bf16
    resolution). Pallas TPU has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


# fast polynomial GELU (no exp / divide, which dominate the erf path's VPU
# time on the decode hot loop); the fit lives in ops/common.gelu_poly —
# ONE source of truth shared with the XLA bf16 gelu
from cor_tpu.ops.common import gelu_poly as _gelu_fast  # noqa: E402


def _kernel(x_ref, w_ref, b_ref, h_ref, o_ref):
    # x_ref: [1, TH, W, C]; w_ref: [C, 4*O]; b_ref: [4*O];
    # h_ref: [1, 4*O, 4*N] block-diagonal hyper weights; o_ref: [1, TH, W, 4*N]
    # raw (p, q, n)-minor layout — the caller rearranges to [B, N, 2H, 2W] in
    # XLA. All in-kernel reshapes split the MAJOR (sublane) dim only; the
    # position contraction is one GEMM against the block-diagonal hyper
    # matrix, so no lane-crossing shape casts (which Mosaic rejects).
    _, th, w, c = x_ref.shape
    n4 = h_ref.shape[2]

    x = x_ref[0].reshape(th * w, c)
    y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)  # [th*w, 4O]
    y = y + b_ref[:].astype(jnp.float32)
    y = _gelu_exact(y)

    h = h_ref[0].astype(jnp.float32)  # [4O, 4N]
    m = jnp.dot(y, h, preferred_element_type=jnp.float32)  # [th*w, 4N]
    o_ref[0] = m.reshape(th, w, n4).astype(o_ref.dtype)


@jax.jit
def fused_upscale2_hyper(
    x: jax.Array,  # [B, H, W, C]
    w: jax.Array,  # [C, 2, 2, O] transposed-conv kernel (einsum layout)
    b: jax.Array,  # [O]
    hyper: jax.Array,  # [B, N, O]
) -> jax.Array:  # [B, N, 2H, 2W] float32
    B, H, W, C = x.shape
    O = w.shape[-1]
    N = hyper.shape[1]
    # kernel -> [C, (2, 2, O)] GEMM layout; bias tiled over the 4 positions
    w2 = w.reshape(C, 4 * O).astype(x.dtype)
    b2 = jnp.tile(b.astype(jnp.float32), 4)
    # block-diagonal hyper weights: H[b, p*O+o, p*N+j] = hyper[b, j, o]
    hyper_t = jnp.swapaxes(hyper, 1, 2).astype(jnp.float32)  # [B, O, N]
    eye4 = jnp.eye(4, dtype=jnp.float32)
    h_blk = jnp.einsum("pq,bon->bpoqn", eye4, hyper_t).reshape(B, 4 * O, 4 * N)
    h_blk = h_blk.astype(x.dtype)

    tile_h = H
    # keep the x tile + fp32 intermediate under ~6 MB of VMEM
    while tile_h > 8 and (tile_h * W * (C * 2 + 4 * O * 4)) > 6 * 1024 * 1024:
        tile_h //= 2
    if H % tile_h != 0:
        tile_h = H  # fall back to one tile per sample

    raw = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * N), jnp.float32),
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, W, C), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4 * O), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * O,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * O, 4 * N), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, 4 * N), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x, w2, b2, h_blk)
    # (p, q, n) minor -> [B, N, 2H, 2W]: the row/col interleave is a pure
    # reshape after the transpose, which XLA fuses into the copy
    m = raw.reshape(B, H, W, 2, 2, N)
    m = m.transpose(0, 5, 1, 3, 2, 4)  # [B, N, H, 2, W, 2]
    return m.reshape(B, N, 2 * H, 2 * W)
