"""Pallas TPU kernel: the decoder's image-side projection bundle.

Per two-way layer, three linear projections consume the same [B, 4096, 256]
image tensor (t2i.k, t2i.v, i2t.q — reference lib/sam_model/transformer.py
applies them to keys/keys+pe). A naive concat-GEMM reads the operand once but
XLA then materializes each output slice as its own fusion pass (~3.3 ms
measured). This kernel reads each keys tile once and writes the three
projected tensors directly — one GEMM per weight block on the MXU, with the
positional-encoding projections (pe @ W, precomputed, batch-1) and biases
added in the epilogue:

    k = keys @ Wk + bk + (pe @ Wk)
    v = keys @ Wv + bv
    q = keys @ Wq + bq + (pe @ Wq)

Forward-only convenience; falls back to interpreter mode off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _kernel(x_ref, wk_ref, bk_ref, wv_ref, bv_ref, wq_ref, bq_ref, kpe_ref, qpe_ref,
            k_ref, v_ref, q_ref):
    x = x_ref[0]  # [T, C]
    k = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)
    k_ref[0] = (k + bk_ref[:].astype(jnp.float32) + kpe_ref[:].astype(jnp.float32)).astype(k_ref.dtype)
    v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)
    v_ref[0] = (v + bv_ref[:].astype(jnp.float32)).astype(v_ref.dtype)
    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)
    q_ref[0] = (q + bq_ref[:].astype(jnp.float32) + qpe_ref[:].astype(jnp.float32)).astype(q_ref.dtype)


@jax.jit
def proj3_pe(
    keys: jax.Array,  # [B, N, C]
    wk: jax.Array, bk: jax.Array,  # [C, I], [I]
    wv: jax.Array, bv: jax.Array,
    wq: jax.Array, bq: jax.Array,
    kpe: jax.Array,  # [N, I] = pe @ Wk (bias-free)
    qpe: jax.Array,  # [N, I] = pe @ Wq
):
    B, N, C = keys.shape
    I = wk.shape[1]
    dt = keys.dtype
    tile = 1024
    while tile > 8 and N % tile != 0:
        tile //= 2

    outs = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, I), dt),
            jax.ShapeDtypeStruct((B, N, I), dt),
            jax.ShapeDtypeStruct((B, N, I), dt),
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
        ],
        out_specs=(
            pl.BlockSpec((1, tile, I), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, I), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, I), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(
        keys,
        wk.astype(dt), bk.astype(jnp.float32),
        wv.astype(dt), bv.astype(jnp.float32),
        wq.astype(dt), bq.astype(jnp.float32),
        kpe.astype(dt), qpe.astype(dt),
    )
    return outs
