"""Pallas TPU kernel: SAM-ViT attention with decomposed relative-position
bias, k/v resident in VMEM.

The reference's ViT attention (lib/sam_model/image_encoder.py:225-241)
materializes fp32 [B*heads, N, N] logits plus the MViTv2 decomposed bias
(image_encoder.py:326-362) through HBM — for the 64x64-token global blocks
that is ~0.8 GB per block, and the 14x14-window blocks churn similar totals
across 25+ windows. Here each grid step holds one head-pair's full k/v in
VMEM (N <= 4096 -> <= 1 MB each), streams q row-tiles, and adds the bias via
indicator-matrix GEMMs:

    logits = scale * q @ k^T
           + rel_h @ Eh      Eh[ki, n] = [n // W == ki]
           + rel_w @ Ew      Ew[kj, n] = [n %  W == kj]

where rel_h/rel_w are the reference's einsum bias factors (computed in XLA —
tiny), so the [Tq, N] logits and softmax never leave VMEM. Heads are
addressed as 128-lane pairs off the fused-QKV GEMM and split in-register.

Forward-only; the image encoder is frozen (param-level stop_gradient), so
this runs on every path. Falls back to interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref, *, scale, head_dim):
    q2 = q_ref[0]  # [Tq, 128] head pair
    k2 = k_ref[0]  # [N, 128]
    v2 = v_ref[0]  # [N, 128]
    outs = []
    for h in range(128 // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        l = jax.lax.dot_general(
            q2[:, sl], k2[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Tq, N]
        l = l + jnp.dot(rh_ref[0, h], eh_ref[:], preferred_element_type=jnp.float32)
        l = l + jnp.dot(rw_ref[0, h], ew_ref[:], preferred_element_type=jnp.float32)
        m = jnp.max(l, axis=-1, keepdims=True)
        e = jnp.exp(l - m)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q2.dtype)
        outs.append(jnp.dot(a, v2[:, sl], preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def vit_attention_relpos_pallas(
    qkv: jax.Array,  # [B, N, 3C] fused-QKV GEMM output
    rel_h: jax.Array,  # [B, HEADS, N, Kh] fp32 bias factors (einsum(q, Rh))
    rel_w: jax.Array,  # [B, HEADS, N, Kw]
    eh: jax.Array,  # [Kh, N] row-indicator
    ew: jax.Array,  # [Kw, N] col-indicator
    num_heads: int,
) -> jax.Array:  # [B, N, C]
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    Kh = rel_h.shape[-1]
    Kw = rel_w.shape[-1]
    P = C // 128
    heads_per_pair = 128 // D

    tq = N
    while tq > 256 and N % (tq // 2) == 0 and tq % 2 == 0:
        tq //= 2

    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / (D**0.5), head_dim=D),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B, P, N // tq),
        in_specs=[
            pl.BlockSpec((1, tq, 128), lambda i, j, t: (i, t, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, P + j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j, t: (i, 0, 2 * P + j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, heads_per_pair, tq, Kh),
                lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, heads_per_pair, tq, Kw),
                lambda i, j, t: (i, j, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Kh, N), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kw, N), lambda i, j, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, 128), lambda i, j, t: (i, t, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, rel_h, rel_w, eh.astype(jnp.float32), ew.astype(jnp.float32))
    return out
