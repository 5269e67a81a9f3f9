"""Training losses.

Parity with the reference (reference: utils/loss_func.py):

- ``wbce_with_wiou_loss`` (:5-32): edge-weight map
  ``1 + 5 * |avg_pool31(mask) - mask|``; weighted BCE-with-logits normalized
  by the weight sum; weighted IoU on sigmoid probs; mean over batch.
- ``fg_feat_similarity_loss`` (:59-85): 1 - cos(masked-pooled query feature,
  support feature) over samples with a non-empty GT mask.
- ``bg_feat_similarity_loss`` (:88-126): (cos(background-pooled query feature,
  support feature) + 1) over samples with non-empty background.

TPU-first delta: the reference indexes valid samples dynamically
(``embeddings[valid]``); under jit we keep static shapes and compute a
masked mean over the validity indicator — identical value, no dynamic shapes.

All losses compute in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cor_tpu.ops.common import l2_normalize
from cor_tpu.ops.resize import avg_pool_same, resize_bilinear


def _masked_mean(per_sample: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    """Mean over samples, restricted to valid (padding-free) rows."""
    if valid is None:
        return jnp.mean(per_sample)
    v = valid.astype(jnp.float32)
    n = jnp.sum(v)
    return jnp.where(n > 0, jnp.sum(per_sample * v) / jnp.maximum(n, 1.0), 0.0)


def wbce_with_wiou_loss(
    pred: jax.Array,  # [B, H, W, 1] logits (NHWC)
    mask: jax.Array,  # [B, H, W, 1] in [0, 1]
    w1: float = 1.0,
    w2: float = 1.0,
    valid: Optional[jax.Array] = None,  # [B] 1 = real row, 0 = mesh padding
) -> jax.Array:
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    weit = 1.0 + 5.0 * jnp.abs(avg_pool_same(mask, kernel=31, padding=15) - mask)

    # BCE with logits: max(x,0) - x*y + log(1+exp(-|x|))
    wbce = (
        jnp.maximum(pred, 0.0)
        - pred * mask
        + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )
    axes = (1, 2, 3)
    wbce = jnp.sum(weit * wbce, axis=axes) / jnp.sum(weit, axis=axes)

    prob = jax.nn.sigmoid(pred)
    inter = jnp.sum(prob * mask * weit, axis=axes)
    union = jnp.sum((prob + mask) * weit, axis=axes) - inter
    wiou = 1.0 - (inter + 1e-6) / (union + 1e-6)

    return _masked_mean(w1 * wbce + w2 * wiou, valid)


def mask_pool_normalized(embeddings: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked average pool + L2 norm (reference: loss_func.py:35-56).

    embeddings [B, H, W, C], mask [B, h, w, 1] -> [B, C].
    """
    embeddings = embeddings.astype(jnp.float32)
    mask = resize_bilinear(mask.astype(jnp.float32), embeddings.shape[1:3])
    mask = jnp.clip(mask, 0.0, 1.0)
    pooled = jnp.sum(embeddings * mask, axis=(1, 2))
    denom = jnp.sum(mask, axis=(1, 2)) + 1e-8
    return l2_normalize(pooled / denom)


def fg_feat_similarity_loss(
    query_embeddings: jax.Array,  # [B, H, W, C]
    support_feat: jax.Array,  # [B, 1, C] L2-normed
    query_mask: jax.Array,  # [B, h, w, 1]
    valid: Optional[jax.Array] = None,  # [B] mesh-padding mask
) -> jax.Array:
    qm = query_mask.astype(jnp.float32)
    nonempty = (jnp.sum(qm, axis=(1, 2, 3)) > 0).astype(jnp.float32)  # [B]
    if valid is not None:
        nonempty = nonempty * valid.astype(jnp.float32)
    qf = mask_pool_normalized(query_embeddings, qm)  # [B, C]
    sf = l2_normalize(support_feat.astype(jnp.float32)[:, 0, :])
    cos = jnp.sum(qf * sf, axis=-1)  # [B]
    return _masked_mean(1.0 - cos, nonempty)


def bg_feat_similarity_loss(
    query_embeddings: jax.Array,
    support_feat: jax.Array,
    query_mask: jax.Array,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Reproduces the reference's bg loss BIT-FOR-BIT, including its
    broadcast quirk (reference: loss_func.py:118-126): the reference calls
    ``F.cosine_similarity(bg_feat [n,1,C], support [n,C], dim=1)``, which
    broadcasts to [n, n, C] and reduces over the SAMPLE axis — so the
    per-(i, c) result is

        s[i, c] = bg[i, c] * colsum(sup)[c]
                  / max(|bg[i, c]| * sqrt(n) * colnorm(sup)[c], 1e-8)

    (NOT the per-sample cosine the docstring describes), then
    ``(s + 1).mean()`` over [n, C]. Verified against the reference
    implementation by tests/test_reference_parity.py's gradient-parity
    harness; the static-shape masked form below is padding-invariant."""
    bg = 1.0 - query_mask.astype(jnp.float32)
    nonempty = (jnp.sum(bg, axis=(1, 2, 3)) > 0).astype(jnp.float32)
    if valid is not None:
        nonempty = nonempty * valid.astype(jnp.float32)
    m = nonempty  # [B] 1 = participates (reference: embeddings[valid])
    n = jnp.sum(m)

    bf = mask_pool_normalized(query_embeddings, bg)  # [B, C], row-normalized
    sup = support_feat.astype(jnp.float32)[:, 0, :]  # [B, C] (raw, as the ref)
    colsum = jnp.sum(sup * m[:, None], axis=0)  # [C] over valid rows
    # sqrt-of-clamped so the backward at an all-zero channel is 0 (torch's
    # norm subgradient); dropout 0.8 on the support features makes whole-zero
    # channels a real occurrence. Forward-identical: den clamps at 1e-8 anyway.
    colnorm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(sup) * m[:, None], axis=0), 1e-24))

    num = bf * colsum[None, :]
    den = jnp.maximum(jnp.abs(bf) * jnp.sqrt(jnp.maximum(n, 1.0)) * colnorm[None, :], 1e-8)
    s = num / den  # [B, C]
    total = jnp.sum((s + 1.0) * m[:, None])
    count = n * s.shape[1]
    return jnp.where(n > 0, total / jnp.maximum(count, 1.0), 0.0)


def core_total_loss(
    pred_mask: jax.Array,  # [B, Hm, Wm, 1] logits
    query_mask_full: jax.Array,  # [B, H, W, 1] GT at data resolution
    query_embeddings: jax.Array,  # [B, He, We, C]
    support_feat: jax.Array,  # [B, 1, C]
    feat_weight: float = 5.0,
    valid: Optional[jax.Array] = None,  # [B] 1 = real row, 0 = mesh padding
):
    """Total loss = seg + 5*fg + 5*bg (reference: utils/trainer_v3_g.py:67-73).

    The GT mask is bilinearly resized to the prediction grid for the
    segmentation term (trainer_v3_g.py:67) and used at full resolution for
    the region-contrastive terms. ``valid`` excludes mesh-padding rows (see
    cor_tpu.parallel.mesh.pad_batch) so a padded batch yields the same loss
    and gradients as the unpadded one.
    """
    target = resize_bilinear(
        query_mask_full.astype(jnp.float32), pred_mask.shape[1:3]
    )
    seg = wbce_with_wiou_loss(pred_mask, target, valid=valid)
    fg = fg_feat_similarity_loss(query_embeddings, support_feat, query_mask_full, valid=valid)
    bg = bg_feat_similarity_loss(query_embeddings, support_feat, query_mask_full, valid=valid)
    total = seg + feat_weight * fg + feat_weight * bg
    return total, {"seg_loss": seg, "fg_loss": fg, "bg_loss": bg, "total_loss": total}
