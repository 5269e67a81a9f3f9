"""Observability: TensorBoard scalars + on-device profiler traces.

Superset of the reference's observability (reference: my_train_a.py:87-88
SummaryWriter; utils/trainer_v3_g.py:120-124,369-375 scalar tags — the same
tags are emitted here), plus `jax.profiler` trace capture, which the
reference has no equivalent of (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path
from typing import Iterator, Optional

log = logging.getLogger("cor_tpu.observability")


# ---------------------------------------------------------------------------
# dependency-free TensorBoard event writer
# ---------------------------------------------------------------------------

# CRC32C (Castagnoli) table — TFRecord framing checksums. Computed once at
# import; the masked form is TFRecord's (crc >> 15 | crc << 17) + 0xa282ead8.
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _masked_crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    crc ^= 0xFFFFFFFF
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        bits = n & 0x7F
        n >>= 7
        out.append(bits | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _scalar_event(wall_time: float, step: int, tag: str, value: float) -> bytes:
    """Hand-encoded tf.Event{wall_time, step, summary{value{tag,
    simple_value}}} — the three protos involved are tiny and frozen, so the
    encoding is inlined rather than depending on tensorflow/protobuf."""
    import struct

    tag_b = tag.encode()
    # Summary.Value: tag = field 1 (len-delim), simple_value = field 2 (float32)
    val = b"\x0a" + _varint(len(tag_b)) + tag_b + b"\x15" + struct.pack("<f", value)
    # Summary: value = repeated field 1
    summary = b"\x0a" + _varint(len(val)) + val
    # Event: wall_time = field 1 (double), step = field 2 (int64),
    #        summary = field 5
    return (
        b"\x09" + struct.pack("<d", wall_time)
        + b"\x10" + _varint(step)
        + b"\x2a" + _varint(len(summary)) + summary
    )


def _version_event(wall_time: float) -> bytes:
    import struct

    v = b"brain.Event:2"
    return b"\x09" + struct.pack("<d", wall_time) + b"\x1a" + _varint(len(v)) + v


class _NativeEventWriter:
    """Pure-Python TensorBoard event-file writer (TFRecord of tf.Event
    protos). Keeps the reference's TB scalar surface (my_train_a.py:87-88)
    alive on hosts without tensorflow instead of silently no-op'ing."""

    def __init__(self, log_dir: Path):
        import socket
        import time

        log_dir.mkdir(parents=True, exist_ok=True)
        name = f"events.out.tfevents.{time.time():.6f}.{socket.gethostname()}"
        self._f = open(log_dir / name, "wb")
        self._record(_version_event(time.time()))

    def _record(self, payload: bytes) -> None:
        import struct

        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc32c(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc32c(payload)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        import time

        self._record(_scalar_event(time.time(), step, tag, value))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class SummaryWriter:
    """torch.utils.tensorboard-compatible scalar writer.

    Backed by tf.summary when tensorflow is importable, by the dependency-
    free `_NativeEventWriter` otherwise — either way the reference's
    TensorBoard scalar surface (my_train_a.py:87-88) is always written.
    """

    def __init__(self, log_dir: str | Path):
        self._writer = None
        self._native = None
        try:
            import tensorflow as tf  # noqa: WPS433

            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._writer = tf.summary.create_file_writer(str(log_dir))
            self._tf = tf
        except Exception:
            self._native = _NativeEventWriter(Path(log_dir))
            log.info(
                "SummaryWriter: tensorflow unavailable — writing TensorBoard "
                "event files with the built-in native writer"
            )

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(tag, float(value), step=int(step))
        else:
            self._native.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        (self._writer or self._native).flush()

    def close(self) -> None:
        (self._writer or self._native).close()


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str | Path]) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto).

    No-op when log_dir is None.
    """
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
