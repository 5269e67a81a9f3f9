"""fused_decoder_tail kernel vs the XLA decoder tail (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from cor_tpu.models.sam_decoder import _conv_transpose_2x
from cor_tpu.ops.common import gelu, layer_norm
from cor_tpu.ops.pallas.decoder_tail import fused_decoder_tail


def test_fused_decoder_tail_matches_xla(rng):
    B, H, W, C, O1, O2, N = 2, 4, 4, 256, 64, 32, 3
    src = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.standard_normal((C, 2, 2, O1)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(O1).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal(O1).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal(O1).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((O1, 2, 2, O2)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(O2).astype(np.float32) * 0.1)
    hyper = jnp.asarray(rng.standard_normal((B, N, O2)).astype(np.float32))

    # XLA oracle — the unfused decoder tail
    x = _conv_transpose_2x({"w": w1, "b": b1}, src)
    x = layer_norm({"scale": ls, "bias": lb}, x, eps=1e-6)
    x = gelu(x)
    up = gelu(_conv_transpose_2x({"w": w2, "b": b2}, x))
    ref = jnp.einsum("bnc,bhwc->bnhw", hyper, up)

    out = fused_decoder_tail(src, w1, b1, ls, lb, w2, b2, hyper)
    assert out.shape == (B, N, 4 * H, 4 * W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_decoder_tail_bf16_production_path(rng):
    """bf16 inputs engage the fast-GELU + bf16 LN-stat path; output must stay
    within bf16-rounding distance of the fp32 XLA composition."""
    B, H, W, C, O1, O2, N = 2, 4, 4, 256, 64, 32, 1
    src = rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.5
    w1 = rng.standard_normal((C, 2, 2, O1)).astype(np.float32) * 0.05
    b1 = rng.standard_normal(O1).astype(np.float32) * 0.1
    ls = rng.standard_normal(O1).astype(np.float32)
    lb = rng.standard_normal(O1).astype(np.float32)
    w2 = rng.standard_normal((O1, 2, 2, O2)).astype(np.float32) * 0.05
    b2 = rng.standard_normal(O2).astype(np.float32) * 0.1
    hyper = rng.standard_normal((B, N, O2)).astype(np.float32)

    x = _conv_transpose_2x({"w": jnp.asarray(w1), "b": jnp.asarray(b1)}, jnp.asarray(src))
    x = layer_norm({"scale": jnp.asarray(ls), "bias": jnp.asarray(lb)}, x, eps=1e-6)
    x = gelu(x)
    up = gelu(_conv_transpose_2x({"w": jnp.asarray(w2), "b": jnp.asarray(b2)}, x))
    ref = jnp.einsum("bnc,bhwc->bnhw", jnp.asarray(hyper), up)

    out = fused_decoder_tail(
        jnp.asarray(src, jnp.bfloat16), jnp.asarray(w1, jnp.bfloat16),
        jnp.asarray(b1), jnp.asarray(ls), jnp.asarray(lb),
        jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2),
        jnp.asarray(hyper, jnp.bfloat16),
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(out - ref))) / scale
    assert rel < 0.05, f"bf16 tail deviates {rel:.3f} (rel) from fp32 oracle"
