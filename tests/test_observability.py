"""SummaryWriter: the TB scalar surface must be written with AND without
tensorflow (reference surface: my_train_a.py:87-88 + the trainer_v3_g.py
scalar tags)."""

import struct

import pytest

from cor_tpu.utils.observability import (
    SummaryWriter,
    _NativeEventWriter,
    _masked_crc32c,
    _scalar_event,
    _varint,
)

def _read_events(path):
    """Decode one event file with tensorflow as the oracle — the TFRecord
    iterator validates the masked CRC32C framing, and event_pb2 validates
    the hand-rolled proto encoding."""
    import tensorflow as tf
    from tensorflow.core.util import event_pb2

    return [
        event_pb2.Event.FromString(rec)
        for rec in tf.compat.v1.io.tf_record_iterator(str(path))
    ]


def _read_records(path):
    """Pure-python TFRecord framing reader (no tensorflow): verifies both
    masked CRCs of every record against the module's own mask math and
    returns the raw event payloads."""
    data = path.read_bytes()
    records, off = [], 0
    while off < len(data):
        hdr = data[off : off + 8]
        (hcrc,) = struct.unpack("<I", data[off + 8 : off + 12])
        assert hcrc == _masked_crc32c(hdr)
        (length,) = struct.unpack("<Q", hdr)
        payload = data[off + 12 : off + 12 + length]
        (pcrc,) = struct.unpack("<I", data[off + 12 + length : off + 16 + length])
        assert pcrc == _masked_crc32c(payload)
        records.append(payload)
        off += 16 + length
    return records


def test_native_event_writer_tf_readable(tmp_path):
    pytest.importorskip("tensorflow")  # only THIS test needs the tf oracle
    w = _NativeEventWriter(tmp_path)
    w.add_scalar("Train/LocalTotalLoss", 1.5, 3)
    w.add_scalar("Val/GlobalDice", 0.25, 7)
    w.close()

    (f,) = list(tmp_path.glob("events.out.tfevents.*"))
    events = _read_events(f)
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value) for e in events[1:] for v in e.summary.value
    ]
    assert scalars == [
        (3, "Train/LocalTotalLoss", 1.5),
        (7, "Val/GlobalDice", 0.25),
    ]
    assert all(e.wall_time > 0 for e in events)


def test_summary_writer_falls_back_without_tf(tmp_path, monkeypatch):
    """With tensorflow unimportable, SummaryWriter must write real event
    files via the native writer (not silently no-op)."""
    import builtins

    real_import = builtins.__import__

    def no_tf(name, *a, **k):
        if name == "tensorflow" or name.startswith("tensorflow."):
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tf)
    w = SummaryWriter(tmp_path / "tb")
    assert w._native is not None and w._writer is None
    w.add_scalar("Train/LearningRate", 1e-4, 0)
    w.flush()
    w.close()
    monkeypatch.undo()

    (f,) = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    # pure-python verification so THIS test holds on tf-less hosts (its
    # whole point): TFRecord framing + CRCs via the module's own mask math
    records = _read_records(f)
    assert len(records) == 2  # file-version event + the scalar event
    assert b"brain.Event:2" in records[0]
    assert b"Train/LearningRate" in records[1]
    try:
        import tensorflow  # noqa: F401

        events = _read_events(f)  # full proto decode when the oracle exists
        assert events[1].summary.value[0].tag == "Train/LearningRate"
        assert events[1].summary.value[0].simple_value == pytest.approx(1e-4)
    except ImportError:
        pass


def test_varint_and_crc_primitives():
    # varint: protobuf wire examples
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"
    # known vector: crc32c(b"123456789") = 0xE3069283; the TFRecord mask
    # ((crc >> 15 | crc << 17) + 0xa282ead8) gives 0xC78AB0E5 — pinning the
    # exact value guards the table/constants even on tf-less hosts (where
    # the native writer is the ONLY event writer)
    assert _masked_crc32c(b"123456789") == 0xC78AB0E5
    hdr = struct.pack("<Q", 13)
    assert 0 <= _masked_crc32c(hdr) < 2**32
    ev = _scalar_event(1.0, 2, "t", 3.0)
    assert isinstance(ev, bytes) and len(ev) > 10
