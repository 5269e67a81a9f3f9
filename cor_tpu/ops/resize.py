"""Image resize / pooling ops with torch-interpolate parity.

The reference leans on ``F.interpolate(mode="bilinear", align_corners=False)``
in several numerically-sensitive places (mask pooling, loss targets, metric
preprocessing). ``jax.image.resize(method="linear")`` uses the same
half-pixel-center convention, but defaults to antialiasing on downscale which
torch does not do — so we pin ``antialias=False`` for parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jax.Array, size: Tuple[int, int], antialias: bool = False
) -> jax.Array:
    """Bilinear resize of NHWC (or NHW1) tensors to spatial `size`.

    Parity with torch F.interpolate(mode='bilinear', align_corners=False)
    (reference: lib/support_model/mask_adapter.py:20,58; utils/trainer_v3_g.py:226).
    """
    n, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    out_shape = (n, size[0], size[1], c)
    return jax.image.resize(x, out_shape, method="linear", antialias=antialias).astype(
        x.dtype
    )


def avg_pool_same(x: jax.Array, kernel: int, padding: int) -> jax.Array:
    """stride-1 average pooling with count_include_pad=True (torch default).

    Matches F.avg_pool2d(kernel_size=31, stride=1, padding=15) used for the
    edge-weight map in the segmentation loss (reference: utils/loss_func.py:18).
    x: NHWC.
    """
    # separable: two 1-D passes are k ops/pixel each instead of k^2 for the
    # 2-D window (31x31 -> ~15x less reduce-window work; bit-identical sums
    # up to fp32 reassociation)
    x32 = x.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        x32, 0.0, jax.lax.add,
        window_dimensions=(1, kernel, 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (padding, padding), (0, 0), (0, 0)),
    )
    summed = jax.lax.reduce_window(
        summed, 0.0, jax.lax.add,
        window_dimensions=(1, 1, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
    )
    return (summed / float(kernel * kernel)).astype(x.dtype)
