"""Side-by-side prediction visualization panels.

Parity target: ``val_visual_for_compare_v2`` — imported by the reference's
eval entry (my_test.py:12) but ABSENT from the live ``utils/vailder.py``
(the import crashes as shipped). Its compiled ancestor survives in
``utils/__pycache__/vailder.cpython-310.pyc``; string/varname inspection of
that bytecode recovers the contract implemented here:

- one PNG per triplet under ``{save_path}/visualizations``
- a horizontal canvas of five equal panels with ``padding`` px gutters:
  query image | query GT mask (RGB) | prediction (RGB) | support image |
  support mask (RGB), each resized to ``target_size`` (default (256, 256))
- a text block below the panels drawn with PIL ``multiline_text`` /
  ``load_default`` font: Sample ID, Text, Compose, Dataset, Target Class
  (metadata joined from the split manifest by pair Id)
- per-sample try/continue like every other dump path (vailder.py:442-492)

Images arrive ImageNet-normalized from the pipeline
(cor_tpu.data.pipeline._to_float_img) and are de-normalized for display;
masks/predictions are rendered 0/255 grayscale replicated to RGB.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

import jax.numpy as jnp

from cor_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

log = logging.getLogger("cor_tpu.eval")

_PRED_KEYS = ("query_img", "support_img", "support_mask", "text")
_TEXT_META = ("Text", "Compose", "Dataset", "Target")


def _denorm_to_pil(img: np.ndarray, size: Tuple[int, int]) -> Image.Image:
    """[H, W, 3] ImageNet-normalized float -> resized RGB PIL image."""
    x = img * IMAGENET_STD + IMAGENET_MEAN
    x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    return Image.fromarray(x, "RGB").resize(size, Image.BILINEAR)


def _mask_to_pil(mask: np.ndarray, size: Tuple[int, int], binarize: bool) -> Image.Image:
    """[H, W] (or [H, W, 1]) float in [0, 1] -> resized RGB 0/255 panel."""
    m = np.asarray(mask, np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    if binarize:
        m = (m > 0.5).astype(np.float32)
    g = np.clip(m * 255.0, 0, 255).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    return Image.fromarray(rgb, "RGB").resize(size, Image.NEAREST)


def _sample_text(pair_id: int, meta) -> str:
    lines = [f"Sample ID: {pair_id}"]
    if meta is not None:
        for col, label in zip(_TEXT_META, ("Text", "Compose", "Dataset", "Target Class")):
            if col in meta:
                lines.append(f"{label}: {meta[col]}")
    return "\n".join(lines)


def render_panel(
    probs_i: np.ndarray,
    batch,
    i: int,
    meta_lookup,
    out_dir: Path,
    target_size: Tuple[int, int] = (256, 256),
    padding: int = 10,
    font=None,
) -> Path:
    """Render one 5-panel comparison canvas (query | GT | pred | support |
    support mask + caption) for sample i of a batch."""
    from PIL import Image, ImageDraw, ImageFont

    font = font or ImageFont.load_default()
    tw, th = target_size
    canvas_width = 5 * tw + 6 * padding
    pair_id = int(batch["pair_id"][i])
    meta = meta_lookup(pair_id)

    panels = [
        _denorm_to_pil(np.asarray(batch["query_img"][i]), target_size),
        _mask_to_pil(np.asarray(batch["query_mask"][i]), target_size, binarize=True),
        _mask_to_pil(probs_i, target_size, binarize=True),
        _denorm_to_pil(np.asarray(batch["support_img"][i]), target_size),
        _mask_to_pil(np.asarray(batch["support_mask"][i]), target_size, binarize=True),
    ]

    text_str = _sample_text(pair_id, meta)
    n_lines = text_str.count("\n") + 1
    line_h = 12  # default PIL bitmap font line height
    text_height = n_lines * line_h + 2 * padding
    canvas_height = th + 2 * padding + text_height

    canvas = Image.new("RGB", (canvas_width, canvas_height), (255, 255, 255))
    for p_idx, panel in enumerate(panels):
        start_x = padding + p_idx * (tw + padding)
        canvas.paste(panel, (start_x, padding))
    draw = ImageDraw.Draw(canvas)
    draw.multiline_text(
        (padding, th + 2 * padding), text_str, fill=(0, 0, 0), font=font
    )

    output_path = out_dir / f"{pair_id}.png"
    canvas.save(output_path)
    return output_path


def val_visual_for_compare(
    predict_fn,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    save_path: str | Path,
    vis_save_dir: str = "visualizations",
    manifest=None,
    target_size: Tuple[int, int] = (256, 256),
    padding: int = 10,
    max_samples: Optional[int] = None,
) -> List[Path]:
    """Render one comparison panel PNG per triplet; returns written paths.

    ``predict_fn(params, batch)`` must return normalized probabilities
    [B, H, W, 1] (cor_tpu.train.step.make_predict_step). ``manifest`` is the
    split's DataFrame for the caption metadata, joined by pair Id (never by
    row position).
    """
    out_dir = Path(save_path) / vis_save_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    from cor_tpu.eval.validator import manifest_meta_lookup

    meta_lookup = manifest_meta_lookup(manifest)

    font = ImageFont.load_default()

    from cor_tpu.eval.validator import predict_stream

    written: List[Path] = []
    sample_idx = 0
    for batch, probs in predict_stream(predict_fn, params, loader):
        if max_samples is not None and sample_idx >= max_samples:
            break
        for i in range(probs.shape[0]):
            if max_samples is not None and sample_idx >= max_samples:
                break
            try:
                written.append(
                    render_panel(
                        probs[i], batch, i, meta_lookup, out_dir,
                        target_size, padding, font,
                    )
                )
            except Exception as e:  # one bad sample must not kill the split
                log.warning(f"visualize: skipping sample {sample_idx} ({e})")
            sample_idx += 1
    log.info(f"Visualizations saved to {out_dir} ({len(written)} panels)")
    return written


# reference import-name alias (my_test.py:12)
val_visual_for_compare_v2 = val_visual_for_compare
