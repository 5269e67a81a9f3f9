"""attention_2d_fused (Pallas rel-pos kernel) vs the XLA attention_2d oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.ops.attention import attention_2d, attention_2d_fused, init_attention_2d


def test_fused_vit_attention_matches_xla(key, rng):
    # C=256 (two 128-lane pairs), 4 heads of 64 — kernel-eligible shape
    H = W = 8
    C, heads = 256, 4
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(H, W))
    # non-zero rel tables so the bias path is actually exercised
    p["rel_pos_h"] = jnp.asarray(rng.standard_normal((2 * H - 1, C // heads)).astype(np.float32) * 0.3)
    p["rel_pos_w"] = jnp.asarray(rng.standard_normal((2 * W - 1, C // heads)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32) * 0.5)

    ref = attention_2d(p, x, heads)
    out = attention_2d_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_vit_attention_fallback_small_dims(key, rng):
    # tiny config (C=32) falls back to the XLA path — must still be exact
    H = W = 4
    C, heads = 32, 2
    p = init_attention_2d(key, C, heads, use_rel_pos=True, input_size=(H, W))
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    ref = attention_2d(p, x, heads)
    out = attention_2d_fused(p, x, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
