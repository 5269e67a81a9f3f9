"""Validator (mask dumps, val_metric CSV) and CLI smoke tests."""

import csv
import json
import sys

import jax
import numpy as np
import pytest
from PIL import Image

from cor_tpu.data.pipeline import DataLoader, SyntheticDataset
from cor_tpu.eval.validator import save_hard_pred_masks, save_soft_pred_masks, val_metric
from cor_tpu.models.core_model import init_core_model
from cor_tpu.train.step import make_predict_step
from tests.helpers import tiny_core_config


@pytest.fixture
def tiny_predict(key):
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    return make_predict_step(cfg), params


def _tiny_loader(n=5, batch=2):
    ds = SyntheticDataset(
        length=n,
        query_img_size=64,
        support_img_size=32,
        context_length=8,
        vocab_size=64,  # tiny SigLIP vocab
        native_hw=(48, 80),  # non-square native size
        seed=3,
    )
    return DataLoader(ds, batch_size=batch, num_workers=2)


def test_save_hard_and_soft_masks(tmp_path, tiny_predict):
    predict, params = tiny_predict
    written = save_hard_pred_masks(predict, params, _tiny_loader(), tmp_path)
    assert len(written) == 5
    img = np.asarray(Image.open(written[0]))
    assert img.shape == (48, 80)  # native GT size (vailder.py:468)
    assert set(np.unique(img)).issubset({0, 255})  # binarized (vailder.py:473)

    soft = save_soft_pred_masks(predict, params, _tiny_loader(), tmp_path)
    simg = np.asarray(Image.open(soft[0]))
    assert simg.shape == (48, 80)
    # actually SOFT: grayscale values between 0 and 255 must survive (a
    # regression to the binarize path would leave only {0, 255})
    assert len(set(np.unique(simg)) - {0, 255}) > 0


def test_val_metric_csv(tmp_path, tiny_predict):
    predict, params = tiny_predict
    summary = val_metric(predict, params, _tiny_loader(), tmp_path / "m.csv")
    with open(tmp_path / "m.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    # reference CSV schema (vailder.py:117-140 metric columns)
    expected_cols = {"Id", "Dice", "MAE", "IoU", "mDice", "mIoU"}
    assert expected_cols.issubset(rows[0].keys())
    for k in ("Dice", "IoU", "mDice", "mIoU"):
        assert 0.0 <= summary[k] <= 1.0


def test_val_metric_native_resolution_geometry(tmp_path, tiny_predict):
    """val_metric evaluates per sample at the native GT size — the same
    geometry save_hard_pred_masks dumps (non-square 48x80 here). A perfect
    'prediction' of the native GT must score Dice = IoU = 1.0."""
    from cor_tpu.eval.validator import sample_metrics

    # geometry check: metrics computed on arrays at native_hw
    gt = np.zeros((48, 80), np.float32)
    gt[10:30, 20:60] = 1.0
    m = sample_metrics(gt, gt)
    assert m["Dice"] == pytest.approx(1.0, abs=1e-4)
    assert m["IoU"] == pytest.approx(1.0, abs=1e-4)
    assert m["MAE"] == 0.0
    # all-zero convention (vailder.py:253-261): empty GT + empty pred => 1.0
    z = np.zeros((48, 80), np.float32)
    mz = sample_metrics(z, z)
    assert mz["Dice"] == 1.0 and mz["IoU"] == 1.0

    # end-to-end: native GT read from disk via query_mask_path
    predict, params = tiny_predict
    gt_png = tmp_path / "native_gt.png"
    from PIL import Image as PILImage

    PILImage.fromarray((gt * 255).astype(np.uint8), "L").save(gt_png)

    class OneBatch:
        def __iter__(self):
            ds = SyntheticDataset(
                length=1, query_img_size=64, support_img_size=32,
                context_length=8, vocab_size=64, native_hw=(48, 80), seed=3,
            )
            b = {k: np.stack([v]) for k, v in ds[0].items()}
            b["query_mask_path"] = np.array([str(gt_png)])
            yield b

    summary = val_metric(predict, params, OneBatch(), tmp_path / "native.csv")
    with open(tmp_path / "native.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert 0.0 <= float(rows[0]["Dice"]) <= 1.0


def test_val_metric_skips_bad_sample(tmp_path, tiny_predict):
    """Per-sample robustness (vailder.py:442-492): a corrupt sample is logged
    and skipped, the rest of the split still evaluates."""
    predict, params = tiny_predict

    class Loader:
        def __iter__(self):
            ds = SyntheticDataset(
                length=2, query_img_size=64, support_img_size=32,
                context_length=8, vocab_size=64, native_hw=(48, 80), seed=3,
            )
            b = {k: np.stack([ds[0][k], ds[1][k]]) for k in ds[0]}
            # first sample: invalid native size -> cv2 resize raises
            b["native_hw"] = np.array([[0, 0], [48, 80]], np.int32)
            yield b

    summary = val_metric(predict, params, Loader(), tmp_path / "skip.csv")
    with open(tmp_path / "skip.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1  # bad sample skipped, good sample kept


def test_config_roundtrip(tmp_path):
    from cor_tpu.config import load_eval_config, load_train_config

    tc = load_train_config("configs/train_config_m3.yaml")
    assert tc.epoch == 15 and tc.batch_size == 10
    assert tc.mask_pooling == "MaskAdapterPooling"
    assert tc.core_config().encoder.depth == 12

    ec = load_eval_config("configs/vaild_config.yaml")
    assert ec.sam_model_name == "sam_base"

    # unknown keys fail fast (the reference silently ignores them)
    bad = tmp_path / "bad.yaml"
    bad.write_text("epoch: 3\nnot_a_key: 1\n")
    with pytest.raises(ValueError, match="not_a_key"):
        load_train_config(bad)

    # encoder_remat knob reaches the model config (None = model default True)
    from cor_tpu.config import TrainConfig

    assert TrainConfig().core_config().encoder.remat_blocks is True
    assert (
        TrainConfig(encoder_remat=False).core_config().encoder.remat_blocks
        is False
    )


def test_pred_mask_filename_parity(tmp_path, tiny_predict):
    """Dump filenames are {pair_id}_{query_mask_name} exactly like the
    reference (vailder.py:466-484), so offline Recall@K tooling keyed on
    that convention matches."""
    predict, params = tiny_predict
    names = [f"q{i}.png" for i in range(5)]
    written = save_hard_pred_masks(
        predict, params, _tiny_loader(), tmp_path, mask_names=names
    )
    assert len(written) == 5
    for i, p in enumerate(written):
        assert p.name.endswith(f"_q{i}.png")
        pair_id = p.name[: -len(f"_q{i}.png")]
        assert pair_id.isdigit()


def test_val_metric_joins_metadata_by_id(tmp_path, tiny_predict):
    """Metadata columns join by pair Id, NOT by row order: a shuffled loader
    must still attach each sample's own manifest row (round-2 advice)."""
    import pandas as pd

    predict, params = tiny_predict
    ds = SyntheticDataset(
        length=4, query_img_size=64, support_img_size=32,
        context_length=8, vocab_size=64, native_hw=(48, 80), seed=3,
    )

    class ShuffledLoader:
        def __iter__(self):
            for idx in (3, 1, 0, 2):
                yield {k: np.stack([v]) for k, v in ds[idx].items()}

    manifest = pd.DataFrame(
        {"Id": [0, 1, 2, 3], "Query_img": [f"img_{i}.jpg" for i in range(4)]}
    )
    val_metric(predict, params, ShuffledLoader(), tmp_path / "m.csv", manifest=manifest)
    with open(tmp_path / "m.csv") as f:
        rows = list(csv.DictReader(f))
    assert [r["Id"] for r in rows] == ["3", "1", "0", "2"]
    for r in rows:
        assert r["Query_img"] == f"img_{r['Id']}.jpg"


def test_val_visual_for_compare_panels(tmp_path, tiny_predict):
    """The visualization dump (working form of the reference's broken
    val_visual_for_compare_v2 import, my_test.py:12): one RGB PNG per
    triplet with five target_size panels + caption block, metadata joined
    by pair Id, max_samples honored."""
    import pandas as pd

    from cor_tpu.eval.visualize import val_visual_for_compare

    predict, params = tiny_predict
    manifest = pd.DataFrame(
        {
            "Id": list(range(5)),
            "Text": [f"make it {i}" for i in range(5)],
            "Compose": [0] * 5,
            "Dataset": ["coco"] * 5,
            "Target": [f"cat_{i}" for i in range(5)],
        }
    )
    tw, th, padding = 64, 64, 10
    written = val_visual_for_compare(
        predict, params, _tiny_loader(), tmp_path,
        manifest=manifest, target_size=(tw, th), padding=padding,
        max_samples=3,
    )
    assert len(written) == 3
    assert sorted(p.name for p in written) == ["0.png", "1.png", "2.png"]
    img = Image.open(written[0])
    assert img.mode == "RGB"
    assert img.width == 5 * tw + 6 * padding  # 5 panels + gutters
    assert img.height > th + 2 * padding  # caption block below the panels
    arr = np.asarray(img)
    assert arr.min() < 64 and arr.max() > 192  # real content was drawn


def test_val_visual_skips_bad_sample(tmp_path, tiny_predict):
    """Per-sample try/continue: one malformed sample never kills the dump."""
    from cor_tpu.eval.visualize import val_visual_for_compare

    predict, params = tiny_predict
    ds = SyntheticDataset(
        length=2, query_img_size=64, support_img_size=32,
        context_length=8, vocab_size=64, seed=3,
    )

    # corrupt one sample's pair_id so the per-sample body fails for it only
    class BadIdLoader:
        def __iter__(self):
            b = {k: np.stack([ds[0][k], ds[1][k]]) for k in ds[0]}
            b["pair_id"] = np.array([0, None], object)
            yield b

    written = val_visual_for_compare(predict, params, BadIdLoader(), tmp_path)
    assert len(written) == 1


def test_load_trained_params_accepts_full_training_checkpoints(tmp_path):
    """The shared inference-CLI loader must restore params from ANY
    trainer-written Orbax layout — params-only (best_model) AND full
    training state (checkpoint_epoch_N: params + opt_state + step + epoch +
    best tracker) — a params-only template rejects the full layouts."""
    import logging

    import numpy as np
    import optax

    from cor_tpu.train.checkpoint import save_checkpoint
    from cor_tpu.utils.convert import load_trained_params
    from tests.helpers import tiny_core_config

    cfg = tiny_core_config()
    logger = logging.getLogger("load-test")
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}
    tx = optax.adamw(1e-3)
    save_checkpoint(
        tmp_path, "checkpoint_epoch_4",
        {
            "params": params,
            "opt_state": tx.init(params),
            "step": np.int32(40),
            "epoch": np.int32(4),
            "best_score": np.float32(0.7),
            "best_epoch": np.int32(3),
            "loss": np.float32(0.1),
        },
    )
    save_checkpoint(tmp_path, "best_model", {"params": params})

    for name in ("checkpoint_epoch_4", "best_model"):
        loaded = load_trained_params(tmp_path / name, cfg, params, logger)
        np.testing.assert_array_equal(np.asarray(loaded["a"]), params["a"])
