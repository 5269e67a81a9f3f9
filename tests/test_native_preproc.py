"""Native C++ preproc (cor_tpu/native): Pillow bit-exactness + pipeline parity."""

import numpy as np
import pytest
from PIL import Image

from cor_tpu.native import native_available, resize_bilinear_u8, resize_normalize_f32

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native preproc unavailable (no g++?)"
)


@pytest.mark.parametrize(
    "shape,out_hw",
    [
        ((747, 1332, 3), (1024, 1024)),  # COR query-image geometry
        ((500, 375, 3), (384, 384)),  # support geometry
        ((1024, 768, 1), (384, 384)),  # mask downscale
        ((7, 5, 1), (64, 64)),  # extreme upscale
        ((100, 80, 3), (256, 512)),  # non-square, mixed up/down
        ((64, 64, 3), (64, 64)),  # identity
    ],
)
def test_resize_bitexact_vs_pillow(rng, shape, out_hw):
    a = rng.integers(0, 256, shape, np.uint8)
    mode = "L" if shape[2] == 1 else "RGB"
    pil = Image.fromarray(a.squeeze(-1) if mode == "L" else a, mode)
    oh, ow = out_hw
    ref = np.asarray(pil.resize((ow, oh), Image.BILINEAR))
    if ref.ndim == 2:
        ref = ref[:, :, None]
    got = resize_bilinear_u8(a, oh, ow)
    np.testing.assert_array_equal(got, ref)


def test_resize_normalize_matches_pil_numpy_chain(rng):
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    a = rng.integers(0, 256, (300, 220, 3), np.uint8)
    pil = Image.fromarray(a, "RGB").resize((128, 128), Image.BILINEAR)
    ref = (np.asarray(pil, np.float32) / 255.0 - mean) / std
    got = resize_normalize_f32(a, 128, 128, mean, std)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_color_enhance_bitexact_vs_pil_imageenhance(rng):
    """cor_color_enhance_u8 reproduces the full PIL ImageEnhance chain
    bit-exactly over the reference's jitter ranges (utils/dataloader.py:38-47:
    brightness/contrast in [0.5, 1.5], color in [0, 2], sharpness in [0, 3])
    — including the interpolation (no clip) vs extrapolation (clip) branches
    and the SMOOTH-filter degenerate with copied borders."""
    from PIL import ImageEnhance

    from cor_tpu.native import color_enhance_u8

    for trial in range(6):
        h, w = int(rng.integers(3, 120)), int(rng.integers(3, 120))
        a = rng.integers(0, 256, (h, w, 3), np.uint8)
        img = Image.fromarray(a, "RGB")
        fb = int(rng.integers(5, 16)) / 10.0
        fc = int(rng.integers(5, 16)) / 10.0
        fcol = int(rng.integers(0, 21)) / 10.0
        fs = int(rng.integers(0, 31)) / 10.0
        ref = ImageEnhance.Brightness(img).enhance(fb)
        ref = ImageEnhance.Contrast(ref).enhance(fc)
        ref = ImageEnhance.Color(ref).enhance(fcol)
        ref = ImageEnhance.Sharpness(ref).enhance(fs)
        got = color_enhance_u8(a, fb, fc, fcol, fs)
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=(
            f"factors b={fb} c={fc} col={fcol} s={fs} shape=({h},{w})"
        ))


@pytest.mark.parametrize("factors", [
    (1.0, 1.0, 1.0, 1.0),   # all identity
    (0.5, 0.5, 0.0, 0.0),   # lower bounds (grayscale + full smooth)
    (1.5, 1.5, 2.0, 3.0),   # upper bounds (full extrapolation clip)
])
def test_color_enhance_boundary_factors(rng, factors):
    from PIL import ImageEnhance

    from cor_tpu.native import color_enhance_u8

    a = rng.integers(0, 256, (33, 47, 3), np.uint8)
    img = Image.fromarray(a, "RGB")
    fb, fc, fcol, fs = factors
    ref = ImageEnhance.Brightness(img).enhance(fb)
    ref = ImageEnhance.Contrast(ref).enhance(fc)
    ref = ImageEnhance.Color(ref).enhance(fcol)
    ref = ImageEnhance.Sharpness(ref).enhance(fs)
    np.testing.assert_array_equal(
        color_enhance_u8(a, fb, fc, fcol, fs), np.asarray(ref)
    )


def test_augment_color_enhance_native_equals_pil(rng, monkeypatch):
    """data.augment.color_enhance: identical output AND identical rng
    consumption on the native and PIL paths (a host without g++ must
    reproduce the same augmented stream for a given seed)."""
    from cor_tpu.data import augment

    img = Image.fromarray(rng.integers(0, 256, (70, 90, 3), np.uint8), "RGB")

    r1 = np.random.default_rng(123)
    native_out = augment.color_enhance(img, r1)
    after_native = r1.integers(0, 1 << 30)

    monkeypatch.setenv("COR_TPU_NO_NATIVE", "1")
    import cor_tpu.native.preproc as npre

    monkeypatch.setattr(npre, "_tried", False)
    monkeypatch.setattr(npre, "_lib", None)
    r2 = np.random.default_rng(123)
    pil_out = augment.color_enhance(img, r2)
    after_pil = r2.integers(0, 1 << 30)
    monkeypatch.setattr(npre, "_tried", False)

    np.testing.assert_array_equal(np.asarray(native_out), np.asarray(pil_out))
    assert after_native == after_pil  # same rng draws on both paths


def test_pipeline_to_float_img_native_equals_pil(rng, monkeypatch):
    """_to_float_img produces identical arrays on both paths."""
    from cor_tpu.data import pipeline as pp

    img = Image.fromarray(rng.integers(0, 256, (90, 120, 3), np.uint8), "RGB")
    mask = Image.fromarray(rng.integers(0, 256, (90, 120), np.uint8), "L")

    native_img = pp._to_float_img(img, 64, True)
    native_mask = pp._to_float_img(mask, 64, False)

    monkeypatch.setenv("COR_TPU_NO_NATIVE", "1")
    import cor_tpu.native.preproc as npre

    monkeypatch.setattr(npre, "_tried", False)
    monkeypatch.setattr(npre, "_lib", None)
    pil_img = pp._to_float_img(img, 64, True)
    pil_mask = pp._to_float_img(mask, 64, False)
    # restore lazy state for other tests
    monkeypatch.setattr(npre, "_tried", False)

    np.testing.assert_allclose(native_img, pil_img, atol=2e-6)
    np.testing.assert_allclose(native_mask, pil_mask, atol=2e-6)
    assert native_mask.shape == (64, 64, 1)


def test_png_encode_gray_roundtrip_and_levels(rng):
    """The native PNG encoder (serving's per-candidate mask writer,
    retrieval/serve.py::_save_masks) emits STANDARD PNGs: Pillow decodes
    them back bit-exactly, at every zlib level, for binary masks, gradients,
    noise, and non-square shapes."""
    import io

    from PIL import Image

    from cor_tpu.native import native_available, png_encode_gray

    if not native_available():
        import pytest

        pytest.skip("no C++ toolchain on this host")

    images = [
        (rng.random((256, 256)) > 0.5).astype(np.uint8) * 255,  # serving mask
        np.tile(np.arange(256, dtype=np.uint8), (17, 1)),  # gradient, non-sq
        rng.integers(0, 256, (100, 37), dtype=np.uint8),  # noise, odd shape
        np.zeros((8, 8), np.uint8),
        np.full((1, 1), 255, np.uint8),
    ]
    for img in images:
        for level in (1, 6, 9):
            back = np.asarray(Image.open(io.BytesIO(png_encode_gray(img, level))))
            np.testing.assert_array_equal(back, img)


def test_save_masks_writes_decodable_pngs(tmp_path):
    """RetrievalServer._save_masks through the native encoder: files land at
    the documented {safe_id}_{pair_id}.png names and decode to the exact
    0/255 masks."""
    from PIL import Image

    from cor_tpu.retrieval.serve import RetrievalServer

    srv = RetrievalServer.__new__(RetrievalServer)  # no model needed
    srv.decode_dir = tmp_path
    srv.pair_ids = np.asarray([10, 20, 30])
    srv._anon_requests = 0
    rng = np.random.default_rng(0)
    masks = (rng.random((2, 64, 64)) > 0.5).astype(np.uint8)
    paths = srv._save_masks("a/b..c", np.asarray([2, 0]), masks)
    assert [p.split("/")[-1] for p in paths] == ["ab..c_30.png", "ab..c_10.png"]
    for p, m in zip(paths, masks):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), m * 255)
