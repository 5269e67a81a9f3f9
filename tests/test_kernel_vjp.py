"""Gradients through the fused Pallas paths (cor_tpu.ops.diff oracle-VJP).

The reference freezes every tower these kernels serve
(reference: lib/build_model.py:112-120), so its training loop never needs
their backward; the TPU framework additionally supports unfrozen fine-tunes
by wrapping each forward-only kernel in ``jax.custom_vjp`` with the XLA
numerics oracle's VJP as the backward (checkpoint-style recompute from the
saved inputs). These tests assert that gradients through the fused paths
match gradients through the pure-XLA oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cor_tpu.ops.attention import (
    attention_2d,
    attention_2d_fused,
    attention_heads,
    attention_seq,
    init_attention_2d,
    init_attention_seq,
    window_partition,
    window_unpartition,
)
from cor_tpu.ops.common import layer_norm
from cor_tpu.ops.pallas.layernorm import add_layer_norm_pallas, layer_norm_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def key():
    return jax.random.PRNGKey(7)


def _tree_allclose(a, b, atol, rtol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=atol, rtol=rtol)


def test_layer_norm_pallas_grad_matches_oracle(rng):
    x = jnp.asarray(rng.standard_normal((16, 256)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(layer_norm_pallas(x, s, b, eps=1e-6)))

    def loss_oracle(x, s, b):
        return jnp.sum(jnp.sin(layer_norm({"scale": s, "bias": b}, x, eps=1e-6)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, s, b)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, s, b)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-5)


def test_add_layer_norm_pallas_grad_matches_oracle(rng):
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    s = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)

    def loss_fused(x, y):
        return jnp.sum(add_layer_norm_pallas(x, y, s, b) ** 2)

    def loss_oracle(x, y):
        return jnp.sum(layer_norm({"scale": s, "bias": b}, x + y) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(x, y)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-5)


def test_attention_seq_grad_matches_oracle(key, rng):
    # C=256, heads=2 (head_dim 128) -> the head-pair kernel path is active
    p = init_attention_seq(key, 256)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)).astype(np.float32) * 0.3)

    def oracle(p, x):
        from cor_tpu.ops.common import dense

        qkv = dense(p["qkv"], x)
        C = qkv.shape[-1] // 3
        q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
        return dense(p["proj"], attention_heads(q, k, v, 2))

    # forward value is the kernel's
    np.testing.assert_allclose(
        np.asarray(attention_seq(p, x, 2)), np.asarray(oracle(p, x)),
        atol=1e-5, rtol=1e-5,
    )

    def loss_fused(p, x):
        return jnp.sum(jnp.tanh(attention_seq(p, x, 2)))

    def loss_oracle(p, x):
        return jnp.sum(jnp.tanh(oracle(p, x)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(p, x)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-5)


def test_attention_seq_lane_padded_heads(key, rng, monkeypatch):
    """head_dim 72 (SO400M: 128 % 72 != 0) through the seq kernel's lane-pad
    shim — heads zero-padded to 128 lanes with the true 1/sqrt(72) scale.
    The shim is OFF by default (measured 12% slower than the transpose
    formulation on-chip, see seq_attention.LANE_PAD_ODD_HEADS) but its
    FORWARD stays parity-proven at the kernel level so the A/B toggle is
    safe to flip. (No gradient assertion: attention_seq's backward is the
    XLA oracle's VJP by construction — with_oracle_vjp — so a grad
    comparison against the same oracle would be tautological; the grad call
    below only smoke-checks that autodiff plumbs through the pad path.)"""
    from cor_tpu.ops.attention import attention_seq_qkv_xla
    from cor_tpu.ops.pallas import seq_attention

    monkeypatch.setattr(seq_attention, "LANE_PAD_ODD_HEADS", True)
    # kernel-level forward parity: the padded pair kernel vs the XLA oracle
    qkv = jnp.asarray(rng.standard_normal((2, 16, 3 * 144)).astype(np.float32) * 0.3)
    out = seq_attention.attention_seq_qkv_pallas(qkv, 2)  # head_dim 72
    ref = attention_seq_qkv_xla(qkv, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # module-level forward + a grad smoke through the custom_vjp wrapper
    p = init_attention_seq(key, 144)
    x = jnp.asarray(rng.standard_normal((2, 16, 144)).astype(np.float32) * 0.3)

    def oracle(p, x):
        from cor_tpu.ops.common import dense

        qkv = dense(p["qkv"], x)
        C = qkv.shape[-1] // 3
        q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
        return dense(p["proj"], attention_heads(q, k, v, 2))

    np.testing.assert_allclose(
        np.asarray(attention_seq(p, x, 2)), np.asarray(oracle(p, x)),
        atol=1e-5, rtol=1e-5,
    )
    g = jax.grad(lambda p, x: jnp.sum(jnp.tanh(attention_seq(p, x, 2))), argnums=1)(p, x)
    assert np.isfinite(np.asarray(g)).all()


def test_attention_2d_fused_grad_global(key, rng):
    # C=128, heads=2 (head_dim 64) with rel-pos tables -> the kernel path
    p = init_attention_2d(key, 128, 2, use_rel_pos=True, input_size=(8, 8))
    for k in ("rel_pos_h", "rel_pos_w"):
        p[k] = jnp.asarray(rng.standard_normal(p[k].shape).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32) * 0.3)

    def loss_fused(p, x):
        return jnp.mean(attention_2d_fused(p, x, 2) ** 2)

    def loss_oracle(p, x):
        return jnp.mean(attention_2d(p, x, 2) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(p, x)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-4)


def test_attention_2d_fused_grad_global_multitile(key, rng):
    # N=1024 > 512 forces the flash backward's q-tile loop (tq=512, t=2):
    # exercises the cross-tile dk/dv VMEM accumulation the N=64 test never
    # reaches (the production 4096-token global blocks run t=8)
    p = init_attention_2d(key, 128, 2, use_rel_pos=True, input_size=(32, 32))
    for k in ("rel_pos_h", "rel_pos_w"):
        p[k] = jnp.asarray(rng.standard_normal(p[k].shape).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 128)).astype(np.float32) * 0.3)

    def loss_fused(p, x):
        return jnp.mean(attention_2d_fused(p, x, 2) ** 2)

    def loss_oracle(p, x):
        return jnp.mean(attention_2d(p, x, 2) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(p, x)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-4)


def test_attention_2d_fused_grad_windowed(key, rng):
    # the fused_window_indexing formulation (window partition inside the
    # kernel's index maps) against the XLA partition + attention_2d oracle
    p = init_attention_2d(key, 128, 2, use_rel_pos=True, input_size=(4, 4))
    for k in ("rel_pos_h", "rel_pos_w"):
        p[k] = jnp.asarray(rng.standard_normal(p[k].shape).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 128)).astype(np.float32) * 0.3)
    window = 4

    def loss_fused(p, x):
        return jnp.mean(attention_2d_fused(p, x, 2, window=window) ** 2)

    def loss_oracle(p, x):
        H, W = x.shape[1], x.shape[2]
        xw, pad_hw = window_partition(x, window)
        xw = attention_2d(p, xw, 2)
        return jnp.mean(window_unpartition(xw, window, pad_hw, (H, W)) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1))(p, x)
    _tree_allclose(g_fused, g_oracle, atol=1e-5, rtol=1e-4)


def test_unfrozen_encoder_fine_tune_grad(key, rng):
    """An UNFROZEN SAM encoder with the fused attention kernels on: jax.grad
    works (no missing-transpose error) and matches the all-XLA encoder."""
    from dataclasses import replace

    from cor_tpu.models.sam_encoder import (
        SamEncoderConfig,
        init_sam_encoder,
        sam_encoder,
    )

    cfg = SamEncoderConfig(
        img_size=96, patch_size=16, embed_dim=128, depth=2, num_heads=2,
        out_chans=32, window_size=4, global_attn_indexes=(1,),
    )
    p = init_sam_encoder(key, cfg)
    for blk in p["blocks"]:
        for k in ("rel_pos_h", "rel_pos_w"):
            blk["attn"][k] = jnp.asarray(
                rng.standard_normal(blk["attn"][k].shape).astype(np.float32) * 0.3
            )
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)).astype(np.float32))

    def loss(p, cfg):
        return jnp.mean(sam_encoder(p, x, cfg) ** 2)

    g_fused = jax.grad(loss)(p, cfg)
    g_xla = jax.grad(loss)(p, replace(cfg, fused_attention=False))
    _tree_allclose(g_fused, g_xla, atol=2e-5, rtol=2e-4)


def test_siglip_tower_grad_with_kernels(key, rng):
    """Unfrozen SigLIP vision tower (kernel-active dims: width 128) is
    differentiable through attention_seq + layer_norm_pallas."""
    from cor_tpu.models.siglip import (
        SigLIPVisionConfig,
        init_siglip_vision,
        siglip_vision,
    )

    cfg = SigLIPVisionConfig(
        image_size=32, patch_size=16, width=128, depth=2, num_heads=2
    )
    p = init_siglip_vision(key, cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    def loss(p):
        pooled, tokens = siglip_vision(p, x, cfg)
        return jnp.mean(pooled**2) + jnp.mean(tokens**2)

    g = jax.grad(loss)(p)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in flat)
    # the ATTENTION-qkv leaves specifically must receive non-zero gradients
    # (any-leaf-nonzero would pass even with a broken attention custom_vjp,
    # via the patch-embed / pooling-head leaves)
    for blk in g["blocks"]:
        qkv_leaves = jax.tree_util.tree_leaves(blk["attn"])
        assert any(float(jnp.abs(l).max()) > 0 for l in qkv_leaves)
