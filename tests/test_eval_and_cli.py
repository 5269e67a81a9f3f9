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
    assert simg.max() <= 255


def test_val_metric_csv(tmp_path, tiny_predict):
    predict, params = tiny_predict
    summary = val_metric(predict, params, _tiny_loader(), tmp_path / "m.csv")
    with open(tmp_path / "m.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    expected_cols = {"pair_id", "dice", "mae", "iou", "mdice", "miou", "dice_bin", "iou_bin"}
    assert expected_cols.issubset(rows[0].keys())
    for k in ("dice", "iou", "dice_bin", "iou_bin"):
        assert 0.0 <= summary[k] <= 1.0


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
