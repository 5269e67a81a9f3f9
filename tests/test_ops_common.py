"""Golden-value tests for core ops against torch-CPU as the numerics oracle.

torch is used ONLY in tests, as an independent implementation of the math the
reference relies on (layer norms, convs, resize, avg-pool edge weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from cor_tpu.ops.common import (
    conv2d,
    dense,
    gelu,
    init_layer_norm,
    layer_norm,
    l2_normalize,
    mlp_stack,
)
from cor_tpu.ops.resize import avg_pool_same, resize_bilinear


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def test_dense_matches_torch(rng):
    x = rng.standard_normal((4, 16), dtype=np.float32)
    w = rng.standard_normal((16, 8), dtype=np.float32)
    b = rng.standard_normal(8, dtype=np.float32)
    y = dense({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    yt = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    assert_close(y, yt.numpy())


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7), dtype=np.float32)
    scale = rng.standard_normal(7, dtype=np.float32)
    bias = rng.standard_normal(7, dtype=np.float32)
    y = layer_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x),
        eps=1e-6,
    )
    yt = tF.layer_norm(
        torch.from_numpy(x), (7,), torch.from_numpy(scale), torch.from_numpy(bias), 1e-6
    )
    assert_close(y, yt.numpy(), atol=1e-5)


def test_layer_norm_2d_channels_first_parity(rng):
    """Our NHWC layer_norm == reference channels_first LayerNorm2d on NCHW."""
    x = rng.standard_normal((2, 6, 4, 4), dtype=np.float32)  # NCHW
    w = rng.standard_normal(6, dtype=np.float32)
    b = rng.standard_normal(6, dtype=np.float32)
    # reference formula (mask_adapter.py:247-251)
    xt = torch.from_numpy(x)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    ref = (xt - u) / torch.sqrt(s + 1e-6)
    ref = torch.from_numpy(w)[:, None, None] * ref + torch.from_numpy(b)[:, None, None]
    y = layer_norm(
        {"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        eps=1e-6,
    )
    assert_close(y, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((128,), dtype=np.float32)
    assert_close(gelu(jnp.asarray(x)), tF.gelu(torch.from_numpy(x)).numpy(), atol=1e-6)


@pytest.mark.parametrize("stride,padding,groups", [(1, 0, 1), (2, 1, 1), (1, 3, 8)])
def test_conv2d_matches_torch(rng, stride, padding, groups):
    cin, cout, k = 8, 8, 3 if groups == 1 else 7
    x = rng.standard_normal((2, 16, 16, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, cin // groups, cout), dtype=np.float32) * 0.1
    b = rng.standard_normal(cout, dtype=np.float32)
    y = conv2d(
        {"w": jnp.asarray(w), "b": jnp.asarray(b)},
        jnp.asarray(x),
        stride=stride,
        padding=padding,
        groups=groups,
    )
    # torch kernel layout OIHW; ours HWIO
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    yt = tF.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        wt,
        torch.from_numpy(b),
        stride=stride,
        padding=padding,
        groups=groups,
    )
    assert_close(y, yt.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


def test_resize_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 9, 9, 3), dtype=np.float32)
    for size in [(27, 27), (5, 5), (64, 64)]:
        y = resize_bilinear(jnp.asarray(x), size)
        yt = tF.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=size,
            mode="bilinear",
            align_corners=False,
        )
        assert_close(y, yt.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-4)


def test_avg_pool_same_matches_torch(rng):
    x = rng.standard_normal((2, 40, 40, 1), dtype=np.float32)
    y = avg_pool_same(jnp.asarray(x), kernel=31, padding=15)
    yt = tF.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), kernel_size=31, stride=1, padding=15
    )
    assert_close(y, yt.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-4)


def test_l2_normalize_matches_torch(rng):
    x = rng.standard_normal((4, 64), dtype=np.float32)
    y = l2_normalize(jnp.asarray(x))
    yt = tF.normalize(torch.from_numpy(x), p=2, dim=-1)
    assert_close(y, yt.numpy(), atol=1e-6)


def test_mlp_stack_relu_chain(rng):
    """3-layer ReLU MLP (mask_decoder.py MLP) — last layer linear."""
    dims = [(8, 16), (16, 16), (16, 4)]
    params = {"layers": []}
    tws = []
    for i, (a, b) in enumerate(dims):
        w = rng.standard_normal((a, b), dtype=np.float32) * 0.3
        bb = rng.standard_normal(b, dtype=np.float32)
        params["layers"].append({"w": jnp.asarray(w), "b": jnp.asarray(bb)})
        tws.append((torch.from_numpy(w), torch.from_numpy(bb)))
    x = rng.standard_normal((2, 8), dtype=np.float32)
    y = mlp_stack(params, jnp.asarray(x))
    xt = torch.from_numpy(x)
    for i, (w, bb) in enumerate(tws):
        xt = xt @ w + bb
        if i < 2:
            xt = torch.relu(xt)
    assert_close(y, xt.numpy(), atol=1e-5)
