"""Offline evaluation: prediction-mask dumps and per-sample CSV metrics.

Parity targets:
- ``save_hard_pred_masks`` (reference: utils/vailder.py:368-510): forward,
  sigmoid + per-sample min-max renorm, resize each prediction to its native
  GT size, binarize > 0.5, save as 0/255 PNG named
  ``{pair_id}_{query_mask_name}`` under ``{save_path}/{pred_save_dir}``.
- ``save_soft_pred_masks`` (vailder.py:513-656): same but grayscale
  (prob * 255) without thresholding.
- ``val_metric`` — the reference ships this broken: my_test.py:12 imports it
  but it only exists commented-out (vailder.py:13-365). Here it is a working
  API: per-sample CSV with binarized Dice/IoU using the all-zero-mask => 1.0
  convention plus soft metrics, and summary means.

Device work (forward + normalize) runs batched under jit; per-sample native
resizes and PNG IO stay on the host.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np
from PIL import Image

import jax.numpy as jnp

from cor_tpu.train.metrics import (
    all_soft_metrics,
    binarized_dice_iou,
)


def _resize_to_native(prob: np.ndarray, hw) -> np.ndarray:
    """Bilinear resize one [H, W] float map to native (h, w) via cv2 (the
    reference uses cv2.resize — vailder.py:468)."""
    import cv2

    h, w = int(hw[0]), int(hw[1])
    return cv2.resize(prob, (w, h), interpolation=cv2.INTER_LINEAR)


def save_pred_masks(
    predict_fn,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    save_path: str | Path,
    pred_save_dir: str = "pred_masks",
    hard: bool = True,
    mask_names: Optional[List[str]] = None,
) -> List[Path]:
    """Run predict_fn batch-wise, dump one PNG per triplet.

    predict_fn(params, batch) must return normalized probabilities
    [B, H, W, 1] (cor_tpu.train.step.make_predict_step).
    """
    out_dir = Path(save_path) / pred_save_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    written: List[Path] = []
    sample_idx = 0
    for batch in loader:
        dev_batch = {
            k: jnp.asarray(batch[k])
            for k in ("query_img", "support_img", "support_mask", "text")
        }
        probs = np.asarray(predict_fn(params, dev_batch))[..., 0]  # [B, H, W]
        for i in range(probs.shape[0]):
            native = batch.get("native_hw")
            hw = native[i] if native is not None else probs.shape[1:3]
            p = _resize_to_native(probs[i], hw)
            if hard:
                img = ((p > 0.5).astype(np.uint8)) * 255  # vailder.py:473
            else:
                img = np.clip(p * 255.0, 0, 255).astype(np.uint8)
            pair_id = int(batch["pair_id"][i])
            name = (
                mask_names[sample_idx]
                if mask_names is not None
                else f"mask_{sample_idx:06d}.png"
            )
            path = out_dir / f"{pair_id}_{name}"
            Image.fromarray(img, "L").save(path)
            written.append(path)
            sample_idx += 1
    return written


def save_hard_pred_masks(predict_fn, params, loader, save_path, pred_save_dir="pred_masks", mask_names=None):
    return save_pred_masks(predict_fn, params, loader, save_path, pred_save_dir, hard=True, mask_names=mask_names)


def save_soft_pred_masks(predict_fn, params, loader, save_path, pred_save_dir="soft_pred_masks", mask_names=None):
    return save_pred_masks(predict_fn, params, loader, save_path, pred_save_dir, hard=False, mask_names=mask_names)


def val_metric(
    predict_fn,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    csv_path: str | Path,
    threshold: float = 0.5,
) -> Dict[str, float]:
    """Per-sample metric CSV + summary means (resurrected vailder.py:225-326
    semantics: binarized Dice/IoU with all-zero => 1.0, plus soft metrics)."""
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for batch in loader:
        dev_batch = {
            k: jnp.asarray(batch[k])
            for k in ("query_img", "support_img", "support_mask", "text")
        }
        probs = predict_fn(params, dev_batch)  # [B, H, W, 1]
        gt = jnp.asarray(batch["query_mask"], jnp.float32)
        if probs.shape[1:3] != gt.shape[1:3]:
            from cor_tpu.ops.resize import resize_bilinear

            probs = resize_bilinear(probs, gt.shape[1:3])
        soft = {k: np.asarray(v) for k, v in all_soft_metrics(probs, gt).items()}
        hard = {
            k: np.asarray(v) for k, v in binarized_dice_iou(probs, gt, threshold).items()
        }
        for i in range(gt.shape[0]):
            rows.append(
                {
                    "pair_id": int(batch["pair_id"][i]),
                    **{k: float(v[i]) for k, v in soft.items()},
                    **{k: float(v[i]) for k, v in hard.items()},
                }
            )

    fields = list(rows[0].keys()) if rows else ["pair_id"]
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)

    summary = {}
    for k in fields:
        if k == "pair_id":
            continue
        summary[k] = float(np.mean([r[k] for r in rows])) if rows else 0.0
    return summary
