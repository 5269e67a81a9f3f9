"""Lane-pad shim shared by the head-pair-addressed attention kernels.

Kernels that address heads as 128-lane blocks straight off a fused-QKV GEMM
output ([B, N, 3C] laid out (q | k | v), heads contiguous inside each third)
require 128 % head_dim == 0. Heads whose lane width doesn't tile 128
(sam_huge: head_dim 80; SO400M: 72) are zero-padded per head to 128 lanes:
q.k over zero lanes adds exactly 0 and zero v columns produce ignored
zeros, so the math is exact PROVIDED the true 1/sqrt(head_dim) softmax
scale is passed to the kernel explicitly (the kernel's default would read
the padded width). Both helpers are linear, so autodiff routes a kernel's
custom_vjp backward through them unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_qkv_heads(qkv: jax.Array, num_heads: int, head_dim: int, to: int = 128) -> jax.Array:
    """[B, N, 3*num_heads*head_dim] -> [B, N, 3*num_heads*to], each head's
    lanes zero-padded head_dim -> to inside its (q | k | v) third."""
    B, N, _ = qkv.shape
    return jnp.pad(
        qkv.reshape(B, N, 3, num_heads, head_dim),
        [(0, 0)] * 4 + [(0, to - head_dim)],
    ).reshape(B, N, 3 * num_heads * to)


def crop_heads(out: jax.Array, num_heads: int, head_dim: int, to: int = 128) -> jax.Array:
    """Inverse of pad_qkv_heads on the kernel output: [B, N, num_heads*to]
    -> [B, N, num_heads*head_dim] (drop each head's zero lanes)."""
    B, N, _ = out.shape
    return out.reshape(B, N, num_heads, to)[..., :head_dim].reshape(
        B, N, num_heads * head_dim
    )
