"""Native (C++) data-plane for the input pipeline.

The reference delegates its host data path to torch DataLoader workers and
PIL's C loops (reference: utils/dataloader.py:220-241); cor_tpu's equivalent
is this small C++ translation unit — Pillow-parity bilinear resample +
normalize in one GIL-released call per sample — compiled on demand with the
system g++ and bound via ctypes. Everything degrades gracefully to the PIL
path when a compiler is unavailable (`native_available()` is False).
"""

from cor_tpu.native.preproc import (
    color_enhance_u8,
    native_available,
    png_encode_gray,
    resize_bilinear_u8,
    resize_normalize_f32,
)

__all__ = [
    "color_enhance_u8",
    "native_available",
    "png_encode_gray",
    "resize_bilinear_u8",
    "resize_normalize_f32",
]
