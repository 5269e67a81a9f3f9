"""Core functional building blocks.

Every module in cor_tpu is a pure (init, apply) pair over nested-dict pytrees:
``init_*`` consumes a PRNG key and returns a params dict of ``jnp`` arrays
(always fp32 — the "master" dtype); apply functions consume params and inputs
and are dtype-polymorphic, computing matmuls in the input dtype with fp32 MXU
accumulation and running normalization statistics in fp32.

Initializer distributions reproduce the PyTorch defaults the reference relies
on (reference: lib/sam_model/common.py, torch nn.Linear/nn.Conv2d `reset_parameters`):
kaiming-uniform(a=sqrt(5)) for weights == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
and the same bound for biases, so that from-scratch training matches the
reference's optimization behavior.

Layout convention: images are NHWC everywhere (TPU-native); the reference's
NCHW tensors map to NHWC with channels last.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializer helpers (torch-default parity)
# ---------------------------------------------------------------------------


def _torch_uniform(key: jax.Array, shape: Sequence[int], fan_in: int) -> jax.Array:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's kaiming_uniform(a=sqrt(5))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def trunc_normal(key: jax.Array, shape: Sequence[int], std: float = 0.02) -> jax.Array:
    """Truncated normal(0, std) in [-2 std, 2 std] (timm-style)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


# ---------------------------------------------------------------------------
# dense
# ---------------------------------------------------------------------------


def init_dense(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    p: Params = {"w": _torch_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = _torch_uniform(kb, (out_dim,), in_dim)
    return p


def dense(p: Params, x: jax.Array) -> jax.Array:
    """y = x @ w + b with fp32 MXU accumulation, output in x.dtype."""
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------


def init_conv2d(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: int | Tuple[int, int],
    bias: bool = True,
    groups: int = 1,
) -> Params:
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    fan_in = (in_ch // groups) * kh * kw
    k1, k2 = jax.random.split(key)
    p: Params = {"w": _torch_uniform(k1, (kh, kw, in_ch // groups, out_ch), fan_in)}
    if bias:
        p["b"] = _torch_uniform(k2, (out_ch,), fan_in)
    return p


def conv2d(
    p: Params,
    x: jax.Array,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] | str = 0,
    groups: int = 1,
) -> jax.Array:
    """NHWC conv with HWIO kernel; matches torch.nn.Conv2d semantics."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    # NOTE: no preferred_element_type — its conv VJP rule emits a mixed-dtype
    # conv_general_dilated (bf16 kernel x fp32 cotangent) that fails to
    # trace; the TPU MXU accumulates in fp32 internally regardless.
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# layer norm (channels-last; fp32 statistics)
# ---------------------------------------------------------------------------


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics.

    With NHWC tensors this single function covers both the reference's
    channels_last LayerNorm and its channels_first LayerNorm2d
    (reference: lib/sam_model/common.py:31-43,
    lib/support_model/mask_adapter.py:226-251) — in NHWC the channel axis is
    always last.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# activations / regularization
# ---------------------------------------------------------------------------


# Phi(x) ~ 0.5 + x * P(x^2): odd minimax fit on [-4, 4] with the endpoints
# PINNED to phi(+-4) = 1/0 exactly, so no output clip is needed (the clipped
# input t = +-4 then yields gelu(x) = x or 0 for any |x| > 4, and the fit's
# excursion outside [0, 1] is < 2.6e-5). Max |gelu err| 5.7e-4 — below bf16
# output rounding (~4e-3 relative on O(1) activations). The two dropped
# clamp ops matter: the decode tail evaluates ~400M GELUs per 128-candidate
# chunk and the VPU chain is on its critical path.
_PHI_COEF = (
    0.3988655684219049,
    -0.06549521524440009,
    0.00915741119509791,
    -0.0008908471655209013,
    5.561942806489455e-05,
    -1.968709803084503e-06,
    2.967939450354871e-08,
)


def gelu_poly(x: jax.Array) -> jax.Array:
    """The polynomial GELU itself (same float dtype in/out). Shared by the
    XLA path below and the Pallas kernels (ops/pallas/upscale._gelu_fast) so
    the fit lives in exactly one place."""
    t = jnp.clip(x, -4.0, 4.0)
    t2 = t * t
    p = jnp.full_like(t, _PHI_COEF[-1])
    for c in _PHI_COEF[-2::-1]:
        p = p * t2 + c
    phi = 0.5 + t * p  # endpoint-pinned fit: already in [0, 1] +- 2.6e-5
    return x * phi


def gelu(x: jax.Array) -> jax.Array:
    """GELU. Exact (erf — torch nn.GELU default) in fp32; on bf16 a pure-FMA
    polynomial whose error sits below bf16 rounding — XLA lowers erf to a
    long VPU transcendental chain that dominates the frozen towers' MLP time
    on TPU (traced: ~half of each SigLIP fc1 fusion)."""
    if x.dtype != jnp.bfloat16:
        return jax.nn.gelu(x, approximate=False)
    return gelu_poly(x.astype(jnp.float32)).astype(x.dtype)


def dropout(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


def drop_path(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """Stochastic depth per sample (reference: lib/support_model/mask_adapter.py:254-286)."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP block (2-layer GELU — reference: lib/sam_model/common.py:13-26)
# ---------------------------------------------------------------------------


def init_mlp_block(key: jax.Array, dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"lin1": init_dense(k1, dim, hidden), "lin2": init_dense(k2, hidden, dim)}


def mlp_block(p: Params, x: jax.Array, act=gelu) -> jax.Array:
    return dense(p["lin2"], act(dense(p["lin1"], x)))


# ---------------------------------------------------------------------------
# misc small modules used across models
# ---------------------------------------------------------------------------


def init_mlp_stack(
    key: jax.Array, in_dim: int, hidden: int, out_dim: int, num_layers: int
) -> Params:
    """ReLU MLP stack (reference: lib/sam_model/mask_decoder.py:147-167)."""
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, num_layers)
    return {
        "layers": [init_dense(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]
    }


def mlp_stack(p: Params, x: jax.Array, sigmoid_output: bool = False) -> jax.Array:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = dense(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize(p=2) parity: x / max(||x||, eps).

    The norm is computed as sqrt(max(sum(x^2), eps^2)) — identical forward
    values, but the backward at x == 0 is ZERO like torch's norm subgradient
    (jnp.linalg.norm's 0/0 there poisons gradients with NaN; a zero vector
    genuinely occurs when a small GT mask downsamples to an empty grid and
    the masked pool returns zeros)."""
    x32 = x.astype(jnp.float32)
    sq = jnp.sum(x32 * x32, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return (x32 / n).astype(x.dtype)
