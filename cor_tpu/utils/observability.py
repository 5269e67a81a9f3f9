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


class SummaryWriter:
    """torch.utils.tensorboard-compatible scalar writer backed by tf.summary.

    Degrades to a no-op if tensorflow is unavailable, so training never
    depends on it — but warns loudly, because the reference's TensorBoard
    scalar surface (my_train_a.py:87-88) silently vanishing would otherwise
    be discovered only after a full run.
    """

    def __init__(self, log_dir: str | Path):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: WPS433

            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self._writer = tf.summary.create_file_writer(str(log_dir))
            self._tf = tf
        except Exception as e:
            self._writer = None
            log.warning(
                "SummaryWriter: tensorflow unavailable (%s) — TensorBoard "
                "scalars will NOT be written; file/console logs still carry "
                "all metrics",
                e,
            )

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


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
