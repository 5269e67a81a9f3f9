"""Augmentations vs the ACTUAL reference functions (utils/dataloader.py:14-74),
with both sides fed identical random draws — pins the parameter semantics
(inclusive/exclusive bounds, draw order, the >>1 crop arithmetic, enhance
scaling) rather than a transcription."""

import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/reference")

# satisfy dataloader.py's imports that this environment lacks (only the
# augmentation functions are exercised — neither stub is ever called)
import types  # noqa: E402

_tv = types.ModuleType("torchvision")
_tv.transforms = types.ModuleType("torchvision.transforms")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tv.transforms)
sys.modules.setdefault("open_clip", types.ModuleType("open_clip"))

import utils.dataloader as ref_dl  # noqa: E402

# drop the torchvision stub again: transformers' availability probe chokes on
# a spec-less module in sys.modules (ref_dl already holds its references)
for _name in ("torchvision", "torchvision.transforms"):
    if getattr(sys.modules.get(_name), "__spec__", "x") is None:
        sys.modules.pop(_name, None)

from cor_tpu.data import augment as aug  # noqa: E402


class ScriptedRng:
    """numpy-Generator look-alike that replays a scripted draw sequence."""

    def __init__(self, integers=(), randoms=()):
        self._ints = list(integers)
        self._rands = list(randoms)

    def integers(self, low, high=None, size=None):
        # the scripted value must lie inside the CALLER's requested bounds:
        # this is what actually pins the inclusive/exclusive-bound semantics
        # the module docstring claims — e.g. an augment op calling
        # integers(5, 20) where the reference needs randint(5, 20) inclusive
        # (i.e. our exclusive high must be 21) fails here when the script
        # replays the reference's boundary draw of 20
        lo, hi = (0, low) if high is None else (low, high)

        def pop():
            v = self._ints.pop(0)
            assert lo <= v < hi, (
                f"scripted draw {v} outside the augment op's requested "
                f"[{lo}, {hi}) — its bounds diverge from the reference "
                "semantics this script encodes"
            )
            return v

        if size is None:
            return pop()
        return np.array([pop() for _ in range(int(size))])

    def random(self):
        return self._rands.pop(0)


@pytest.fixture
def imgs(rng):
    img = Image.fromarray(rng.integers(0, 255, (70, 90, 3), np.uint8), "RGB")
    gt = Image.fromarray((rng.random((70, 90)) > 0.5).astype(np.uint8) * 255, "L")
    return img, gt


def test_random_crop_matches_reference(imgs, monkeypatch):
    img, gt = imgs
    # reference draws cropped_width then cropped_height via np.random.randint
    draws = iter([85, 61])
    monkeypatch.setattr(ref_dl.np.random, "randint", lambda lo, hi: next(draws))
    want_img, want_gt = ref_dl.randomCrop(img, gt)

    got_img, got_gt = aug.random_crop(img, gt, ScriptedRng(integers=[85, 61]))
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(got_gt), np.asarray(want_gt))


def test_random_rotation_matches_reference(imgs, monkeypatch):
    img, gt = imgs
    monkeypatch.setattr(ref_dl.random, "random", lambda: 0.95)  # trigger (p=0.2)
    monkeypatch.setattr(ref_dl.np.random, "randint", lambda lo, hi: -11)
    want_img, want_gt = ref_dl.randomRotation(img, gt)

    got_img, got_gt = aug.random_rotation(img, gt, ScriptedRng(integers=[-11], randoms=[0.95]))
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(got_gt), np.asarray(want_gt))

    # non-trigger branch is identity on both sides
    monkeypatch.setattr(ref_dl.random, "random", lambda: 0.1)
    w2, _ = ref_dl.randomRotation(img, gt)
    g2, _ = aug.random_rotation(img, gt, ScriptedRng(randoms=[0.1]))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(w2))


def test_color_enhance_matches_reference(imgs, monkeypatch):
    img, _ = imgs
    # reference: random.randint INCLUSIVE bounds -> intensities /10, drawn in
    # the order brightness, contrast, color, sharpness
    seq = iter([13, 7, 20, 0])
    monkeypatch.setattr(ref_dl.random, "randint", lambda lo, hi: next(seq))
    want = ref_dl.colorEnhance(img)

    # ours: rng.integers EXCLUSIVE high — same values must reproduce exactly
    got = aug.color_enhance(img, ScriptedRng(integers=[13, 7, 20, 0]))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_random_pepper_matches_reference(imgs, monkeypatch):
    _, gt = imgs
    n = int(0.0015 * 70 * 90)  # 9 noise pixels
    assert n == 9
    xs = [3, 10, 20, 30, 40, 50, 60, 5, 15]
    ys = [7, 14, 21, 28, 35, 42, 49, 56, 63]
    flips = [0, 1, 0, 1, 0, 1, 0, 1, 0]
    # reference draw order per pixel: x, y, salt-or-pepper (random.randint,
    # inclusive hi)
    seq = iter(v for triple in zip(xs, ys, flips) for v in triple)
    monkeypatch.setattr(ref_dl.random, "randint", lambda lo, hi: next(seq))
    want = ref_dl.randomPeper(gt)

    # ours draws vectorized: all xs, then all ys, then all flips
    got = aug.random_pepper(gt, ScriptedRng(integers=xs + ys + flips))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
