"""Pallas TPU kernel: whole-sequence self-attention in VMEM.

The SigLIP towers attend over 576 patch (or 64 text) tokens; XLA materializes
the fp32 [B, H, N, N] logits and softmax through HBM (~11 ms of a 29 ms
Q=16 query encode). At these lengths the full [N, N] attention matrix for one
(batch, head) fits comfortably in VMEM, so each grid step computes
    softmax(q @ k^T / sqrt(d)) @ v
entirely on-chip — no flash accumulation needed, nothing but q/k/v tiles and
the [N, D] output cross HBM.

The caller flattens (batch, head) into the leading axis and zero-pads
head_dim to 128 lanes (zero pads don't change q @ k^T, and padded v columns
produce ignored zeros). The kernels are forward-only; the public entry
(cor_tpu.ops.attention.attention_seq) wraps the core in an XLA-oracle
custom_vjp (cor_tpu.ops.diff), so unfrozen fine-tunes differentiate through
it — under the reference's frozen towers the backward is never built.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    l = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [N, N] fp32 in VMEM
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[0] = jnp.dot(a, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_dim",))
def _attention_padded(q: jax.Array, k: jax.Array, v: jax.Array, head_dim: int):
    """q/k/v: [M, N, 128] (lane-padded); head_dim is the true dimension."""
    M, N, Dp = q.shape
    return pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / (head_dim**0.5)),
        out_shape=jax.ShapeDtypeStruct((M, N, Dp), q.dtype),
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, N, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(q, k, v)


def attention_seq_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int
) -> jax.Array:
    """Multi-head attention over [B, H, N, D] operands -> [B, H, N, D].

    Mosaic accepts sub-128 lane blocks (64-lane head_dim measured fine), so
    operands go in unpadded — padding cost ~4 ms/encode when it was there.
    """
    B, H, N, D = q.shape
    out = _attention_padded(
        q.reshape(B * H, N, D), k.reshape(B * H, N, D), v.reshape(B * H, N, D),
        head_dim=D,
    )
    return out.reshape(B, H, N, D)


def _kernel_pair(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim):
    """Two heads per 128-lane block, split in-register."""
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]  # [N, 128]
    outs = []
    for h in range(128 // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        l = jax.lax.dot_general(
            q2[:, sl], k2[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(l, axis=-1, keepdims=True)
        e = jnp.exp(l - m)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q2.dtype)
        outs.append(jnp.dot(a, v2[:, sl], preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _qkv_pair_call(qkv: jax.Array, C: int, D: int, scale: float) -> jax.Array:
    B, N, _ = qkv.shape
    P = C // 128
    return pl.pallas_call(
        functools.partial(_kernel_pair, scale=scale, head_dim=D),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B, P),
        in_specs=[
            pl.BlockSpec((1, N, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j: (i, 0, P + j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 128), lambda i, j: (i, 0, 2 * P + j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qkv, qkv, qkv)


# A/B toggle for the lane-pad path below (SO400M's head_dim 72). Measured
# on-chip (tools/encode_trace.py --model ViT-SO400M-14-SigLIP-384, Q=16
# device-loop protocol): lane-pad 120.7 ms/iter vs transpose formulation
# 107.6 — 12% SLOWER. Unlike the SAM rel-pos kernel (where the lane-pad shim
# replaced full XLA attention and won 3.0x), the alternative here is already
# a Pallas kernel; padding 72 -> 128 costs 78% more q.k/AV MXU lanes, which
# outweighs the [B,H,N,72] transposes it removes. Kept A/B-able for
# re-measurement on newer Mosaic; forward-parity-tested either way
# (tests/test_kernel_vjp.py::test_attention_seq_lane_padded_heads).
LANE_PAD_ODD_HEADS = False


@functools.partial(jax.jit, static_argnames=("num_heads",))
def attention_seq_qkv_pallas(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Attention straight off the fused-QKV GEMM output.

    qkv: [B, N, 3*C] laid out (q | k | v) with heads contiguous inside each
    third. Head PAIRS are addressed by 128-lane block index and split
    in-register — no transposes or copies anywhere. Returns [B, N, C] with
    heads re-merged in place, ready for the out-projection.

    Heads whose lane width doesn't tile 128 (SO400M: head_dim 72) are
    zero-padded to 128 lanes per head (q.k over zero lanes adds exactly 0)
    with the TRUE 1/sqrt(D) scale passed explicitly — the same shim as the
    SAM rel-pos kernel's. Tiny test configs (C < 128) fall back to the
    transpose formulation.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    pad_heads = 128 % D != 0 and D <= 128 and LANE_PAD_ODD_HEADS
    if (C % 128 != 0 or 128 % D != 0) and not pad_heads:
        q, k, v = jnp.split(qkv.reshape(B, N, 3, num_heads, D), 3, axis=2)

        def t(x):
            return x[:, :, 0].transpose(0, 2, 1, 3)

        out = attention_seq_pallas(t(q), t(k), t(v), num_heads)
        return out.transpose(0, 2, 1, 3).reshape(B, N, C)

    if pad_heads:
        from cor_tpu.ops.pallas.lane_pad import crop_heads, pad_qkv_heads

        out = _qkv_pair_call(
            pad_qkv_heads(qkv, num_heads, D), num_heads * 128, 128,
            scale=1.0 / (D**0.5),
        )
        return crop_heads(out, num_heads, D)

    return _qkv_pair_call(qkv, C, D, scale=1.0 / (D**0.5))
