"""ctypes binding for the native preproc library (see preproc.cpp).

Build-on-first-use: compiles preproc.cpp with the system g++ into a cached
shared object next to the source (kept out of git). Set COR_TPU_NO_NATIVE=1
to force the pure-PIL fallback path.
"""

from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "preproc.cpp"
# The cache name carries a host-ISA tag: the build uses -march=native, so a
# cached .so compiled on one machine can SIGILL loader threads on another
# (e.g. a shared filesystem mounted across heterogeneous CPUs) — and SIGILL
# cannot be caught by _build's except-fallback. The tag hashes the CPU
# feature flags, which distinguishes e.g. AVX2 from AVX-512 hosts that both
# report machine()=="x86_64".


def _isa_tag() -> str:
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    import hashlib

    h = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


_SO = _HERE / f"_preproc.{_isa_tag()}.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if os.environ.get("COR_TPU_NO_NATIVE"):
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            # compile to a process-unique temp path, then atomically rename:
            # concurrent processes (train + eval CLIs, pytest workers) must
            # never CDLL a half-written .so
            tmp = _SO.with_suffix(f".{os.getpid()}.tmp")
            subprocess.run(
                # -ffp-contract=off: the ImageEnhance blend must round mul
                # and add separately (Pillow wheels target baseline x86-64
                # without FMA); -march=native would otherwise contract
                # f*(in2-in1)+in1 into an FMA and flip ~2% of truncations
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp), "-lz"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)
        lib = ctypes.CDLL(str(_SO))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.cor_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.cor_resize_normalize_f32.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.cor_color_enhance_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            u8p,
        ]
        lib.cor_png_gray_bound.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.cor_png_gray_bound.restype = ctypes.c_longlong
        lib.cor_png_encode_gray.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_longlong,
        ]
        lib.cor_png_encode_gray.restype = ctypes.c_longlong
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        with _lock:
            if not _tried:
                _lib = _build()
                _tried = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _as_u8_hwc(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    assert img.dtype == np.uint8 and img.ndim == 3
    return img


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Pillow-BILINEAR-parity resize of a uint8 HWC (or HW) image."""
    lib = _get_lib()
    assert lib is not None, "native preproc unavailable"
    src = _as_u8_hwc(img)
    h, w, c = src.shape
    dst = np.empty((oh, ow, c), np.uint8)
    lib.cor_resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
    )
    return dst


def color_enhance_u8(
    img: np.ndarray, f_bright: float, f_contrast: float, f_color: float,
    f_sharp: float,
) -> np.ndarray:
    """Pillow-ImageEnhance-parity jitter chain on a uint8 HWC RGB image:
    brightness -> contrast -> color -> sharpness (reference semantics
    utils/dataloader.py:38-47; bit-exactness proven in
    tests/test_native_preproc.py)."""
    lib = _get_lib()
    assert lib is not None, "native preproc unavailable"
    src = np.ascontiguousarray(img)
    assert src.dtype == np.uint8 and src.ndim == 3 and src.shape[2] == 3
    h, w, _ = src.shape
    dst = np.empty_like(src)
    lib.cor_color_enhance_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        f_bright, f_contrast, f_color, f_sharp,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dst


def png_encode_gray(img: np.ndarray, level: int = 1) -> bytes:
    """Encode an 8-bit grayscale [H, W] array as a complete PNG (color type
    0, filter 0 scanlines, one IDAT) — standard, any decoder reads it.
    GIL-released zlib work: serving's per-candidate mask writes
    (retrieval/serve.py::_save_masks) encode off the dispatcher's critical
    path and in parallel across writer threads. Level 1 is ~10x cheaper
    than Pillow's default level 6 on near-binary masks (round-trip
    bit-exactness pinned in tests/test_native_preproc.py)."""
    lib = _get_lib()
    assert lib is not None, "native preproc unavailable"
    src = np.ascontiguousarray(img)
    assert src.dtype == np.uint8 and src.ndim == 2
    h, w = src.shape
    cap = int(lib.cor_png_gray_bound(h, w))
    out = np.empty(cap, np.uint8)
    n = int(lib.cor_png_encode_gray(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, int(level),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    ))
    assert n > 0, "png encode failed"
    return out[:n].tobytes()


def resize_normalize_f32(
    img: np.ndarray, oh: int, ow: int,
    mean: Optional[np.ndarray] = None, std: Optional[np.ndarray] = None,
) -> np.ndarray:
    """resize + (x/255 - mean)/std -> float32 HWC in one native call."""
    lib = _get_lib()
    assert lib is not None, "native preproc unavailable"
    src = _as_u8_hwc(img)
    h, w, c = src.shape
    mean = np.zeros(c, np.float32) if mean is None else np.asarray(mean, np.float32)
    std = np.ones(c, np.float32) if std is None else np.asarray(std, np.float32)
    assert mean.shape == (c,) and std.shape == (c,)
    dst = np.empty((oh, ow, c), np.float32)
    lib.cor_resize_normalize_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        np.ascontiguousarray(mean).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(std).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return dst
