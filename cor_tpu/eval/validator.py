"""Offline evaluation: prediction-mask dumps and per-sample CSV metrics.

Parity targets:
- ``save_hard_pred_masks`` (reference: utils/vailder.py:368-510): forward,
  sigmoid + per-sample min-max renorm, resize each prediction to its native
  GT size, binarize > 0.5, save as 0/255 PNG named
  ``{pair_id}_{query_mask_name}`` under ``{save_path}/{pred_save_dir}``.
  Each sample save is wrapped in try/continue so one bad sample never kills
  a split run (vailder.py:442-492).
- ``save_soft_pred_masks`` (vailder.py:513-656): same but grayscale
  (prob * 255) without thresholding.
- ``val_metric`` — the reference ships this broken: my_test.py:12 imports it
  but it only exists commented-out (vailder.py:13-365). Here it is a working
  API with the commented semantics: per-sample metrics at NATIVE GT
  resolution, the binarized metric set {Dice, MAE, IoU, mDice, mIoU} with the
  all-zero-mask => 1.0 convention (vailder.py:225-365), streamed to a CSV
  with the reference's column schema (vailder.py:117-140), plus summary
  means. Native GT is read from disk when the loader provides
  ``query_mask_path``; otherwise the batched GT is resized back to
  ``native_hw``.

Device work (forward + normalize) runs batched under jit; per-sample native
resizes, metrics, and PNG IO stay on the host in numpy (ragged shapes would
otherwise trigger one XLA compile per distinct native size).
"""

from __future__ import annotations

import csv
import logging
import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np
from PIL import Image

import jax.numpy as jnp

log = logging.getLogger("cor_tpu.eval")

_PRED_KEYS = ("query_img", "support_img", "support_mask", "text")


def _resize_to_native(prob: np.ndarray, hw) -> np.ndarray:
    """Bilinear resize one [H, W] float map to native (h, w) via cv2 (the
    reference uses cv2.resize — vailder.py:468)."""
    import cv2

    h, w = int(hw[0]), int(hw[1])
    if prob.shape == (h, w):
        return prob
    return cv2.resize(prob, (w, h), interpolation=cv2.INTER_LINEAR)


# ---------------------------------------------------------------------------
# per-sample numpy metrics (binarized set — vailder.py:225-365 semantics)
# ---------------------------------------------------------------------------


def _np_dice(pred_soft: np.ndarray, gt_bin: np.ndarray, smooth=1e-5, threshold=0.5) -> float:
    p = (pred_soft > threshold).astype(np.float64)
    g = gt_bin.astype(np.float64)
    inter, ps, gs = float((p * g).sum()), float(p.sum()), float(g.sum())
    if ps == 0.0 and gs == 0.0:
        return 1.0  # all-zero convention (vailder.py:253-261)
    return (2.0 * inter + smooth) / (ps + gs + smooth)


def _np_iou(pred_soft: np.ndarray, gt_bin: np.ndarray, smooth=1e-5, threshold=0.5) -> float:
    p = (pred_soft > threshold).astype(np.float64)
    g = gt_bin.astype(np.float64)
    inter, ps, gs = float((p * g).sum()), float(p.sum()), float(g.sum())
    if ps == 0.0 and gs == 0.0:
        return 1.0
    return (inter + smooth) / (ps + gs - inter + smooth)


def sample_metrics(pred_soft: np.ndarray, gt_bin: np.ndarray) -> Dict[str, float]:
    """The commented val_metric's per-sample metric set: binarized Dice/IoU,
    soft MAE, and mDice/mIoU as the fg/bg average where the background
    prediction is the SOFT complement re-binarized (vailder.py:329-365)."""
    dice = _np_dice(pred_soft, gt_bin)
    iou = _np_iou(pred_soft, gt_bin)
    bg_dice = _np_dice(1.0 - pred_soft, 1.0 - gt_bin)
    bg_iou = _np_iou(1.0 - pred_soft, 1.0 - gt_bin)
    return {
        "Dice": dice,
        "MAE": float(np.abs(pred_soft - gt_bin).mean()),
        "IoU": iou,
        "mDice": 0.5 * (dice + bg_dice),
        "mIoU": 0.5 * (iou + bg_iou),
    }


# ---------------------------------------------------------------------------
# mask dumps
# ---------------------------------------------------------------------------


def predict_stream(predict_fn, params, loader):
    """One device forward per batch -> (batch, probs [B, H, W]) pairs — the
    shared prediction loop every eval consumer iterates."""
    for batch in loader:
        dev_batch = {k: jnp.asarray(batch[k]) for k in _PRED_KEYS}
        yield batch, np.asarray(predict_fn(params, dev_batch))[..., 0]


def dump_sample(
    probs_i: np.ndarray,
    batch,
    i: int,
    sample_idx: int,
    out_dir: Path,
    hard: bool,
    mask_names: Optional[List[str]],
) -> Path:
    """Write one prediction PNG at the GT's native resolution, named
    {pair_id}_{query_mask_name} (reference: vailder.py:442-492)."""
    native = batch.get("native_hw")
    hw = native[i] if native is not None else probs_i.shape[:2]
    p = _resize_to_native(probs_i, hw)
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
    return path


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
    [B, H, W, 1] (cor_tpu.train.step.make_predict_step). Per-sample failures
    are logged and skipped (reference: vailder.py:442-492 try/continue).
    """
    out_dir = Path(save_path) / pred_save_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    written: List[Path] = []
    sample_idx = 0
    for batch, probs in predict_stream(predict_fn, params, loader):
        for i in range(probs.shape[0]):
            try:
                written.append(
                    dump_sample(probs[i], batch, i, sample_idx, out_dir, hard, mask_names)
                )
            except Exception as e:  # one bad sample must not kill the split
                log.warning(f"skipping sample {sample_idx} ({e})")
            sample_idx += 1
    return written


def save_hard_pred_masks(predict_fn, params, loader, save_path, pred_save_dir="pred_masks", mask_names=None):
    return save_pred_masks(predict_fn, params, loader, save_path, pred_save_dir, hard=True, mask_names=mask_names)


def save_soft_pred_masks(predict_fn, params, loader, save_path, pred_save_dir="soft_pred_masks", mask_names=None):
    return save_pred_masks(predict_fn, params, loader, save_path, pred_save_dir, hard=False, mask_names=mask_names)


# ---------------------------------------------------------------------------
# per-sample CSV metrics at native GT resolution
# ---------------------------------------------------------------------------

_META_COLUMNS = (
    "Query_img",
    "Query_mask",
    "Support_img",
    "Support_mask",
    "Text",
    "Compose",
    "Dataset",
    "Target",
    "query_cat",
)


def manifest_meta_lookup(manifest):
    """Manifest-row lookup by pair Id, shared by val_metric and the
    visualization panels: (DataFrame or None) -> lookup(pid) -> row or None.

    Joins by the reference CSV's ``Id`` column (NEVER by row position, so a
    shuffled/sharded loader cannot misalign metadata). Duplicate Ids take
    the first row. A string-typed Id column is coerced to numeric so int
    pair ids from the loader still match."""
    if manifest is None or "Id" not in getattr(manifest, "columns", ()):
        return lambda pid: None
    import pandas as pd

    ids = manifest["Id"]
    try:
        ids = pd.to_numeric(ids)
    except (ValueError, TypeError):
        pass  # genuinely non-numeric ids: match as-is
    df = manifest.set_index(ids)

    def lookup(pid):
        if pid not in df.index:
            return None
        m = df.loc[pid]
        if getattr(m, "ndim", 1) == 2:  # duplicate Ids: take first
            m = m.iloc[0]
        return m

    return lookup


def _native_gt(batch, i, hw) -> Optional[np.ndarray]:
    """Binary GT at native resolution: from disk when the loader carries
    query_mask_path, else the batched (data-res) GT resized back."""
    paths = batch.get("query_mask_path")
    if paths is not None:
        path = str(paths[i])
        if path and os.path.exists(path):
            gt = np.asarray(Image.open(path).convert("L"), np.float32) / 255.0
            return (gt > 0.5).astype(np.float32)
    gt = batch.get("query_mask")
    if gt is None:
        return None
    g = _resize_to_native(np.asarray(gt[i], np.float32)[..., 0], hw)
    return (g > 0.5).astype(np.float32)


def val_metric(
    predict_fn,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    csv_path: str | Path,
    manifest=None,
) -> Dict[str, float]:
    """Per-sample metric CSV + summary means at native GT resolution
    (resurrected vailder.py:13-365 semantics).

    Per sample: resize the normalized prediction to its native (h, w),
    re-stretch to [0, 1] (the reference normalizes AFTER interpolating to GT
    resolution — vailder.py:89-98; here predict_fn normalizes at the model
    grid, so the post-resize re-stretch restores the same range), then the
    binarized metric set against the native binary GT.

    ``manifest`` (the split's DataFrame, e.g. ``CORDataset.df``) joins the
    reference's metadata columns into the CSV by pair Id — NOT by row order,
    so a shuffled/sharded/drop_last loader can never silently misalign
    metadata with metrics; geometry matches save_hard_pred_masks exactly
    (same cv2 resize to the same native_hw).
    """
    csv_path = Path(csv_path)
    meta_lookup = manifest_meta_lookup(manifest)
    rows = []
    sample_idx = 0
    for batch, probs in predict_stream(predict_fn, params, loader):
        for i in range(probs.shape[0]):
            try:
                rows.append(metric_row(probs[i], batch, i, meta_lookup))
            except Exception as e:
                log.warning(f"val_metric: skipping sample {sample_idx} ({e})")
            sample_idx += 1
    return write_metric_csv(rows, csv_path)


def run_eval_split(
    predict_fn,
    params,
    loader,
    out_dir: str | Path,
    manifest=None,
    mask_names: Optional[List[str]] = None,
    soft: bool = False,
    visualize_n: int = 0,
    csv_name: str = "val_metric.csv",
) -> Dict:
    """ONE forward pass per batch feeding every eval consumer — hard (and
    optionally soft) mask dumps, the per-sample metric CSV, and the first N
    visualization panels. Running the four consumers separately re-runs the
    SAM-encoder-dominated forward up to 4x over the whole split
    (cli.eval previously did exactly that).

    Returns {"hard": [paths], "soft": [paths], "panels": [paths],
    "summary": {metric: mean}}.
    """
    out_dir = Path(out_dir)
    hard_dir = out_dir / "pred_masks"
    hard_dir.mkdir(parents=True, exist_ok=True)
    soft_dir = out_dir / "soft_pred_masks"
    if soft:
        soft_dir.mkdir(parents=True, exist_ok=True)
    vis_dir = out_dir / "visualizations"
    if visualize_n:
        vis_dir.mkdir(parents=True, exist_ok=True)
        from cor_tpu.eval.visualize import render_panel

    meta_lookup = manifest_meta_lookup(manifest)
    hard_written: List[Path] = []
    soft_written: List[Path] = []
    panels: List[Path] = []
    rows: List[Dict] = []
    sample_idx = 0
    for batch, probs in predict_stream(predict_fn, params, loader):
        for i in range(probs.shape[0]):
            try:
                hard_written.append(
                    dump_sample(probs[i], batch, i, sample_idx, hard_dir, True, mask_names)
                )
            except Exception as e:
                log.warning(f"skipping sample {sample_idx} ({e})")
            if soft:
                try:
                    soft_written.append(
                        dump_sample(probs[i], batch, i, sample_idx, soft_dir, False, mask_names)
                    )
                except Exception as e:
                    log.warning(f"soft dump: skipping sample {sample_idx} ({e})")
            try:
                rows.append(metric_row(probs[i], batch, i, meta_lookup))
            except Exception as e:
                log.warning(f"val_metric: skipping sample {sample_idx} ({e})")
            if visualize_n and len(panels) < visualize_n:
                try:
                    panels.append(
                        render_panel(probs[i], batch, i, meta_lookup, vis_dir)
                    )
                except Exception as e:
                    log.warning(f"visualize: skipping sample {sample_idx} ({e})")
            sample_idx += 1
    summary = write_metric_csv(rows, out_dir / csv_name)
    return {
        "hard": hard_written,
        "soft": soft_written,
        "panels": panels,
        "summary": summary,
    }


def metric_row(probs_i: np.ndarray, batch, i: int, meta_lookup) -> Dict:
    """One sample's binarized-metric CSV row at native GT resolution, with
    the manifest's metadata columns joined by pair Id."""
    native = batch.get("native_hw")
    hw = native[i] if native is not None else probs_i.shape[:2]
    p = _resize_to_native(probs_i.astype(np.float32), hw)
    p = (p - p.min()) / (p.max() - p.min() + 1e-8)
    gt = _native_gt(batch, i, hw)
    if gt is None:
        raise ValueError("no GT available for sample")
    pid = int(batch["pair_id"][i])
    row = {"Id": pid}
    m = meta_lookup(pid)
    if m is not None:
        for c in _META_COLUMNS:
            if c in m:
                row[c] = m[c]
    row.update(sample_metrics(p, gt))
    return row


def write_metric_csv(rows: List[Dict], csv_path: Path) -> Dict[str, float]:
    """Write the per-sample CSV (ordered-union fieldnames: the per-row meta
    join can yield differing key sets, and DictWriter raises on keys absent
    from fieldnames) and return the metric summary means."""
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    fields = list(dict.fromkeys(k for r in rows for k in r)) if rows else ["Id"]
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields, restval="")
        writer.writeheader()
        writer.writerows(rows)
    metric_keys = ("Dice", "MAE", "IoU", "mDice", "mIoU")
    return {
        k: (float(np.mean([r[k] for r in rows])) if rows else 0.0) for k in metric_keys
    }
