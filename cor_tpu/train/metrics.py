"""Evaluation metrics.

Parity with the reference's soft per-sample metrics
(reference: utils/trainer_v3_g.py:381-443) and its validation preprocessing:
sigmoid + per-sample min-max renormalization (trainer_v3_g.py:228-231).

Also implements the binarized per-sample metrics with the all-zero-mask => 1.0
convention from the commented-out val_metric (reference: utils/vailder.py:225-326),
exposed as a working API (the reference ships it broken — my_test.py:12 imports
a function that no longer exists).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _flat(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def normalize_prediction(pred_logits: jax.Array) -> jax.Array:
    """sigmoid + per-sample min-max renorm (trainer_v3_g.py:228-231)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    axes = tuple(range(1, p.ndim))
    pmin = jnp.min(p, axis=axes, keepdims=True)
    pmax = jnp.max(p, axis=axes, keepdims=True)
    return (p - pmin) / (pmax - pmin + 1e-8)


def compute_dice(pred: jax.Array, gt: jax.Array, smooth: float = 1e-5) -> jax.Array:
    p, g = _flat(pred), _flat(gt)
    inter = jnp.sum(p * g, axis=1)
    return (2.0 * inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(g, axis=1) + smooth)


def compute_mae(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(_flat(pred) - _flat(gt)), axis=1)


def compute_iou(pred: jax.Array, gt: jax.Array, smooth: float = 1e-5) -> jax.Array:
    p, g = _flat(pred), _flat(gt)
    inter = jnp.sum(p * g, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(g, axis=1) - inter
    return (inter + smooth) / (union + smooth)


def compute_mdice(pred: jax.Array, gt: jax.Array, smooth: float = 1e-5) -> jax.Array:
    return 0.5 * (compute_dice(pred, gt, smooth) + compute_dice(1 - pred, 1 - gt, smooth))


def compute_miou(pred: jax.Array, gt: jax.Array, smooth: float = 1e-5) -> jax.Array:
    return 0.5 * (compute_iou(pred, gt, smooth) + compute_iou(1 - pred, 1 - gt, smooth))


def all_soft_metrics(pred: jax.Array, gt: jax.Array) -> Dict[str, jax.Array]:
    """Per-sample metric vector dict — the val_stage metric set."""
    return {
        "dice": compute_dice(pred, gt),
        "mae": compute_mae(pred, gt),
        "iou": compute_iou(pred, gt),
        "mdice": compute_mdice(pred, gt),
        "miou": compute_miou(pred, gt),
    }


# ---------------------------------------------------------------------------
# binarized metrics with the all-zero => 1.0 convention (vailder.py:253-261)
# ---------------------------------------------------------------------------


def binarized_dice_iou(
    pred: jax.Array, gt: jax.Array, threshold: float = 0.5
) -> Dict[str, jax.Array]:
    """Per-sample Dice/IoU on thresholded masks.

    Convention: if both the prediction and GT are empty, Dice = IoU = 1.0;
    if exactly one is empty, 0.0 (reference: vailder.py:253-283 commented
    val_metric semantics).
    """
    p = (_flat(pred) > threshold).astype(jnp.float32)
    g = (_flat(gt) > threshold).astype(jnp.float32)
    p_sum = jnp.sum(p, axis=1)
    g_sum = jnp.sum(g, axis=1)
    inter = jnp.sum(p * g, axis=1)
    union = p_sum + g_sum - inter

    both_empty = (p_sum == 0) & (g_sum == 0)
    one_empty = ((p_sum == 0) | (g_sum == 0)) & ~both_empty

    dice = jnp.where(
        both_empty, 1.0, jnp.where(one_empty, 0.0, 2.0 * inter / jnp.maximum(p_sum + g_sum, 1.0))
    )
    iou = jnp.where(
        both_empty, 1.0, jnp.where(one_empty, 0.0, inter / jnp.maximum(union, 1.0))
    )
    return {"dice_bin": dice, "iou_bin": iou}
