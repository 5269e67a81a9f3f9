"""Checkpoint save/restore.

TPU-native replacement for the reference's two checkpoint formats
(reference: utils/trainer_v3_g.py:126-144 plain torch.save dicts;
DeepSpeed save_state directories). Here: Orbax directory checkpoints holding
{params, opt_state, epoch, step, best} pytrees with atomic writes, plus
best-model double-save semantics (trainer_v3_g.py:340-356) implemented by the
trainer.

The torch-dialect importers (SAM .pth, open_clip SigLIP .bin, trained CORE
checkpoints with DDP 'module.' prefixes) live in cor_tpu.utils.convert.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_path(p) -> Path:
    return Path(p).absolute()


def save_checkpoint(
    directory: str | Path,
    name: str,
    payload: Dict[str, Any],
    overwrite: bool = True,
) -> Path:
    """Atomic Orbax save of an arbitrary pytree under directory/name."""
    path = _as_path(directory) / name
    ckptr = ocp.StandardCheckpointer()
    if overwrite and path.exists():
        import shutil

        shutil.rmtree(path)
    host_payload = jax.tree.map(np.asarray, payload)
    ckptr.save(path, host_payload)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(
    directory: str | Path,
    name: str,
    template: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    path = _as_path(directory) / name
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree.map(np.asarray, template)
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def latest_epoch_checkpoint(directory: str | Path) -> Optional[str]:
    """Find the newest `checkpoint_epoch_N` under directory (resume support,
    reference: my_train_a.py:206-223)."""
    d = _as_path(directory)
    if not d.exists():
        return None
    best, best_epoch = None, -1
    for entry in d.iterdir():
        if entry.is_dir() and entry.name.startswith("checkpoint_epoch_"):
            try:
                e = int(entry.name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if e > best_epoch:
                best, best_epoch = entry.name, e
    return best
