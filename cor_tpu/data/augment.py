"""Training-time augmentations, PIL-equivalent to the reference
(reference: utils/dataloader.py:14-74). These run on the host CPU (the
reference runs them in DataLoader workers) — PIL resampling differs from
jax.image at edges, so the augmentation path intentionally stays PIL.

- random_crop: joint center-biased crop up to a 30px border (:14-26)
- random_rotation: +-15 deg bicubic with p=0.2 (:29-35)
- color_enhance: brightness/contrast/color/sharpness jitter (:38-47)
- random_pepper: 0.15% salt-and-pepper on the mask (:63-74)
- random_gaussian (:50-60) is defined-but-unused in the reference; provided
  for completeness and likewise not wired into the default pipeline.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance


def random_crop(img: Image.Image, gt: Image.Image, rng: np.random.Generator):
    border = 30
    w, h = img.size
    cw = int(rng.integers(w - border, w))
    ch = int(rng.integers(h - border, h))
    region = ((w - cw) >> 1, (h - ch) >> 1, (w + cw) >> 1, (h + ch) >> 1)
    return img.crop(region), gt.crop(region)


def random_rotation(img: Image.Image, gt: Image.Image, rng: np.random.Generator):
    if rng.random() > 0.8:
        angle = int(rng.integers(-15, 15))
        img = img.rotate(angle, Image.BICUBIC)
        gt = gt.rotate(angle, Image.BICUBIC)
    return img, gt


def color_enhance(img: Image.Image, rng: np.random.Generator) -> Image.Image:
    # jitter factors drawn UP FRONT in the reference's order (brightness,
    # contrast, color, sharpness — dataloader.py:38-47) so the native and
    # PIL paths consume the rng identically and (seed, epoch, idx)
    # determinism holds on hosts with and without the C++ data plane
    fb = int(rng.integers(5, 16)) / 10.0
    fc = int(rng.integers(5, 16)) / 10.0
    fcol = int(rng.integers(0, 21)) / 10.0
    fs = int(rng.integers(0, 31)) / 10.0

    from cor_tpu.native import native_available

    if native_available() and img.mode == "RGB":
        # one GIL-released C call for the whole 4-enhancer chain — the
        # single-threaded PIL chain was ~51 ms/sample, ~60% of the host
        # input-pipeline cost (BASELINE.md); bit-exactness vs PIL is proven
        # in tests/test_native_preproc.py
        from cor_tpu.native import color_enhance_u8

        return Image.fromarray(
            color_enhance_u8(np.asarray(img), fb, fc, fcol, fs), "RGB"
        )
    img = ImageEnhance.Brightness(img).enhance(fb)
    img = ImageEnhance.Contrast(img).enhance(fc)
    img = ImageEnhance.Color(img).enhance(fcol)
    img = ImageEnhance.Sharpness(img).enhance(fs)
    return img


def random_pepper(gt: Image.Image, rng: np.random.Generator) -> Image.Image:
    arr = np.array(gt)
    noise_num = int(0.0015 * arr.shape[0] * arr.shape[1])
    if noise_num > 0:
        xs = rng.integers(0, arr.shape[0], noise_num)
        ys = rng.integers(0, arr.shape[1], noise_num)
        vals = rng.integers(0, 2, noise_num) * 255
        arr[xs, ys] = vals.astype(arr.dtype)
    return Image.fromarray(arr)


def random_gaussian(
    img: Image.Image, rng: np.random.Generator, mean: float = 0.1, sigma: float = 0.35
) -> Image.Image:
    arr = np.asarray(img, dtype=np.float32)
    arr = arr + rng.normal(mean, sigma, arr.shape)
    return Image.fromarray(np.uint8(np.clip(arr, 0, 255)))


def train_augment(img: Image.Image, gt: Image.Image, rng: np.random.Generator):
    """The reference's training augmentation chain (dataloader.py:169-174)."""
    img, gt = random_crop(img, gt, rng)
    img, gt = random_rotation(img, gt, rng)
    img = color_enhance(img, rng)
    gt = random_pepper(gt, rng)
    return img, gt
