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


class CheckpointWriter:
    """Async-capable checkpoint writer for the training loop.

    The reference blocks the loop on every ``torch.save``
    (trainer_v3_g.py:126-144). With ``async_save=True`` the Orbax
    AsyncCheckpointer writes the directory in a background thread: ``save``
    returns after the device->host snapshot (the part that must be
    consistent with training continuing to mutate params), and the
    file-system write overlaps the next training steps. Writes are
    serialized — a new save first drains the previous one, so at most one
    is in flight and overwriting an existing directory never races its own
    pending write. Call ``wait()`` before process exit (Trainer.fit does)."""

    def __init__(self, async_save: bool = False):
        self.async_save = async_save
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if async_save
            else None
        )

    def save(
        self,
        directory: str | Path,
        name: str,
        payload: Dict[str, Any],
        overwrite: bool = True,
    ) -> Path:
        if self._ckptr is None:
            return save_checkpoint(directory, name, payload, overwrite=overwrite)
        path = _as_path(directory) / name
        self._ckptr.wait_until_finished()  # serialize; guard the rmtree below
        if overwrite and path.exists():
            import shutil

            shutil.rmtree(path)
        # snapshot NOW, by copy: np.asarray is a no-op view for host arrays,
        # and the caller (training loop) keeps mutating params while the
        # background write proceeds
        host_payload = jax.tree.map(lambda x: np.array(x), payload)
        self._ckptr.save(path, args=ocp.args.StandardSave(host_payload))
        return path

    def wait(self) -> None:
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()


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


def resolve_resume(cfg, state, logger):
    """Resume-decision logic shared by the train CLI (my_train_a.py:206-223).

    Returns (state, start_epoch). Semantics:
    - explicit ``cfg.load_checkpoint_path``: missing or unrestorable is a
      hard error (the reference fails loudly too), never a silent fresh start
    - auto-resume (newest ``checkpoint_epoch_N``): unrestorable degrades to
      a fresh start, but with a prominent WARNING — a corrupted latest
      checkpoint silently restarting a long run is the failure mode
    - checkpoints are saved with or without a 'loss' entry (epoch saves carry
      one; best_model_full / interrupted saves don't) — probe both templates
    """
    from cor_tpu.train.step import TrainState

    start_epoch = 1
    explicit = bool(cfg.load_checkpoint_path)
    resume = cfg.load_checkpoint_path or latest_epoch_checkpoint(cfg.train_model_save_path)
    if explicit and not Path(str(cfg.train_model_save_path), str(resume)).exists():
        raise FileNotFoundError(
            f"load_checkpoint_path={resume!r} not found under "
            f"{cfg.train_model_save_path!r}"
        )
    if resume and Path(str(cfg.train_model_save_path), str(resume)).exists():
        base = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.int32(0),
        }
        restored, last_err = None, None
        for template in (base, {**base, "loss": np.float32(0)}):
            try:
                restored = restore_checkpoint(cfg.train_model_save_path, str(resume), template)
                break
            except Exception as e:
                last_err = e
        if restored is not None:
            state = TrainState(restored["params"], restored["opt_state"], restored["step"])
            start_epoch = int(restored["epoch"]) + 1
            logger.info(f"Resumed from {resume} at epoch {start_epoch}")
        elif explicit:
            raise RuntimeError(
                f"load_checkpoint_path={resume!r} could not be restored: {last_err}"
            )
        else:
            logger.warning(
                f"AUTO-RESUME FAILED: found {resume!r} under "
                f"{cfg.train_model_save_path!r} but it could not be restored "
                f"({last_err}). Training RESTARTS FROM SCRATCH at epoch 1 — "
                "if this run was meant to continue, stop it and repair/point "
                "load_checkpoint_path at a good checkpoint (explicit paths "
                "hard-fail instead of restarting)."
            )
    return state, start_epoch


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
