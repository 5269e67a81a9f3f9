"""Pallas TPU kernels: LayerNorm and fused residual-add + LayerNorm.

Motivation (measured on TPU v5e): the decoder's image-side tensors are
[128, 4096, 256] bf16 (268 MB); an XLA layer_norm pass costs ~2.4 ms because
the fp32 upcast materializes through HBM. A single-pass VMEM kernel reads the
operand once and writes once (~0.7 ms), and fusing the preceding residual add
removes another full read+write round trip. Numerics match cor_tpu.ops.common
.layer_norm (fp32 statistics, biased variance) — asserted by tests against
the XLA formulation.

Kernels fall back to interpreter mode off-TPU so the same code path is tested
on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cor_tpu.ops.pallas.upscale import _interpret




def _ln_block(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    o_ref[:] = _ln_block(x_ref[:], s_ref[:], b_ref[:], eps).astype(o_ref.dtype)


def _add_ln_kernel(x_ref, y_ref, s_ref, b_ref, o_ref, *, eps):
    z = x_ref[:].astype(jnp.float32) + y_ref[:].astype(jnp.float32)
    o_ref[:] = _ln_block(z, s_ref[:], b_ref[:], eps).astype(o_ref.dtype)


def _row_tiling(n_rows: int, c: int):
    """Pick a row-block size: keep tiles ~(<=1024) rows and grid even."""
    block = 1024
    while block > 8 and n_rows % block != 0:
        block //= 2
    if n_rows % block != 0:
        return None  # fall back to XLA
    return block


@functools.partial(jax.jit, static_argnames=("eps",))
def _layer_norm_pallas_impl(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
):
    """LayerNorm over the last axis. x: [..., C]."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n_rows = x.size // c
    block = _row_tiling(n_rows, c)
    if block is None or c % 128 != 0:
        from cor_tpu.ops.common import layer_norm

        return layer_norm({"scale": scale, "bias": bias}, x, eps=eps)
    x2 = x.reshape(n_rows, c)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_rows, c), x.dtype),
        grid=(n_rows // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("eps",))
def _add_layer_norm_pallas_impl(
    x: jax.Array, y: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
):
    """LayerNorm(x + y) over the last axis, fused (residual + norm)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n_rows = x.size // c
    block = _row_tiling(n_rows, c)
    if block is None or c % 128 != 0:
        from cor_tpu.ops.common import layer_norm

        return layer_norm({"scale": scale, "bias": bias}, x + y, eps=eps)
    x2 = x.reshape(n_rows, c)
    y2 = y.reshape(n_rows, c)
    out = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_rows, c), x.dtype),
        grid=(n_rows // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2, y2, scale, bias)
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# differentiable public entry points (kernel forward, XLA-oracle backward)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ln_diff(eps: float):
    from cor_tpu.ops.common import layer_norm
    from cor_tpu.ops.diff import with_oracle_vjp

    return with_oracle_vjp(
        lambda x, s, b: _layer_norm_pallas_impl(x, s, b, eps=eps),
        lambda x, s, b: layer_norm({"scale": s, "bias": b}, x, eps=eps),
    )


@functools.lru_cache(maxsize=None)
def _add_ln_diff(eps: float):
    from cor_tpu.ops.common import layer_norm
    from cor_tpu.ops.diff import with_oracle_vjp

    return with_oracle_vjp(
        lambda x, y, s, b: _add_layer_norm_pallas_impl(x, y, s, b, eps=eps),
        lambda x, y, s, b: layer_norm({"scale": s, "bias": b}, x + y, eps=eps),
    )


def layer_norm_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6):
    """LayerNorm over the last axis, differentiable (oracle-VJP backward)."""
    return _ln_diff(eps)(x, scale, bias)


def add_layer_norm_pallas(
    x: jax.Array, y: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
):
    """LayerNorm(x + y), fused forward, differentiable (oracle-VJP backward)."""
    return _add_ln_diff(eps)(x, y, scale, bias)
