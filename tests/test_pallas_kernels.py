"""Pallas kernels vs their XLA oracles (run in interpreter mode on the CPU
mesh; the same kernel code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.ops.common import gelu, layer_norm
from cor_tpu.ops.pallas.layernorm import add_layer_norm_pallas, layer_norm_pallas
from cor_tpu.ops.pallas.upscale import fused_upscale2_hyper


def test_layer_norm_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((4, 64, 256)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    ref = layer_norm({"scale": s, "bias": b}, x, eps=1e-5)
    out = layer_norm_pallas(x, s, b, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_layer_norm_pallas_odd_shape_fallback(rng):
    # C not a multiple of 128 -> XLA fallback path
    x = jnp.asarray(rng.standard_normal((3, 7, 96)).astype(np.float32))
    s = jnp.ones(96)
    b = jnp.zeros(96)
    ref = layer_norm({"scale": s, "bias": b}, x, eps=1e-6)
    out = layer_norm_pallas(x, s, b, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_add_layer_norm_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 128, 256)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 128, 256)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    ref = layer_norm({"scale": s, "bias": b}, x + y, eps=1e-5)
    out = add_layer_norm_pallas(x, y, s, b, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_upscale2_hyper_matches_xla(rng):
    B, H, W, C, O, N = 2, 8, 8, 64, 32, 3
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((C, 2, 2, O)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(O).astype(np.float32) * 0.1)
    hyper = jnp.asarray(rng.standard_normal((B, N, O)).astype(np.float32))

    # XLA oracle: einsum convT + gelu + contraction
    y = jnp.einsum("bhwc,cpqo->bhpwqo", x, w)
    y = y.reshape(B, 2 * H, 2 * W, O) + b
    up = gelu(y)
    ref = jnp.einsum("bnc,bhwc->bnhw", hyper, up)

    out = fused_upscale2_hyper(x, w, b, hyper)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_mask_decoder_fused_matches_unfused(key, rng):
    from cor_tpu.models.sam_decoder import init_mask_decoder, mask_decoder
    from tests.helpers import TINY_DECODER

    params = init_mask_decoder(key, TINY_DECODER)
    B, H = 2, 4
    emb = jnp.asarray(rng.standard_normal((B, H, H, 16)).astype(np.float32))
    pe = jnp.asarray(rng.standard_normal((1, H, H, 16)).astype(np.float32))
    sparse = jnp.asarray(rng.standard_normal((B, 1, 16)).astype(np.float32))
    dense_e = jnp.asarray(rng.standard_normal((B, H, H, 16)).astype(np.float32))
    for mm in (False, True):
        m0, i0, _ = mask_decoder(params, emb, pe, sparse, dense_e, TINY_DECODER, mm, fused=False)
        m1, i1, _ = mask_decoder(params, emb, pe, sparse, dense_e, TINY_DECODER, mm, fused=True)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), atol=1e-5)


def test_i2t_attention_fused_per_head_softmax_stability(rng):
    """The i2t kernel's softmax shift must be PER-HEAD: with one head's
    logits sitting hundreds below another head's max, a global-max shift
    underflows that whole head's exponentials to 0 (normalizer 0 -> NaN).
    The per-head mean shift must stay exact vs a per-head XLA softmax."""
    import jax.numpy as jnp

    from cor_tpu.ops.pallas.i2t_attention import i2t_attention_fused

    B, N, I, C, T, H = 1, 16, 16, 32, 6, 2
    hd = I // H
    q = rng.standard_normal((B, N, I)).astype(np.float32)
    # bias head 0's keys by +300/sqrt(hd): its logits sit ~hundreds above
    # head 1's, the exact cross-head spread that NaN'd a global-max shift
    k = rng.standard_normal((B, T, I)).astype(np.float32)
    k[:, :, :hd] += 300.0
    v = rng.standard_normal((B, T, I)).astype(np.float32)
    w_out = rng.standard_normal((I, C)).astype(np.float32) * 0.1
    b_out = rng.standard_normal((C,)).astype(np.float32) * 0.1
    s = np.ones((C,), np.float32)
    b = np.zeros((C,), np.float32)

    keys = rng.standard_normal((B, N, C)).astype(np.float32)
    out = np.asarray(
        i2t_attention_fused(
            jnp.asarray(q), jnp.asarray(keys),
            jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(w_out), jnp.asarray(b_out), jnp.asarray(s), jnp.asarray(b),
            num_heads=H,
        )
    )
    assert np.isfinite(out).all(), "per-head softmax underflowed to NaN"

    # exactness vs the unfused per-head XLA oracle on the SAME biased inputs
    from cor_tpu.ops.attention import attention_heads
    from cor_tpu.ops.common import layer_norm

    ref_attn = attention_heads(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H)
    ref = layer_norm(
        {"scale": jnp.asarray(s), "bias": jnp.asarray(b)},
        jnp.asarray(keys) + ref_attn @ jnp.asarray(w_out) + jnp.asarray(b_out),
        eps=1e-5,
    )
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-4, rtol=2e-4)
