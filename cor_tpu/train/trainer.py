"""Epoch-level training / validation driver.

Capability parity with the reference's train_stage/val_stage
(reference: utils/trainer_v3_g.py:21-377) on top of the jitted steps:

- per-epoch LR scheduling via `lr_schedule(epoch)` exactly like the
  reference's `scheduler.step(epoch)` before train_stage (my_train_a.py:252-259)
- windowed loss meter + ETA logging (trainer_v3_g.py:82-97)
- periodic checkpoints every `train_model_save_epoch` (:126-144)
- KeyboardInterrupt -> emergency checkpoint (:146-168)
- validation with globally-weighted metric means — under jit the (sum, count)
  reduction over the mesh IS the reference's gather-weighted mean (:271-290)
- best-model selection on Dice + IoU, double save (:329-356)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.config import TrainConfig
from cor_tpu.parallel import make_mesh, replicated, shard_batch
from cor_tpu.parallel.mesh import DATA_AXIS
from cor_tpu.train.checkpoint import CheckpointWriter
from cor_tpu.train.step import TrainState, make_eval_step, make_train_step
from cor_tpu.utils.meters import AverageMeter, StepTimer


@dataclass
class BestTracker:
    """Best-model selection on global Dice + IoU (trainer_v3_g.py:329-339)."""

    best_score: float = float("-inf")
    best_epoch: int = -1
    best_metrics: Dict[str, float] = field(default_factory=dict)

    def update(self, epoch: int, metrics: Dict[str, float]) -> bool:
        score = metrics["dice"] + metrics["iou"]
        if score > self.best_score:
            self.best_score = score
            self.best_epoch = epoch
            self.best_metrics = dict(metrics)
            return True
        return False


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        state: TrainState,
        tx,
        lr_schedule: Callable,
        logger,
        mesh=None,
        writer=None,
        profile_steps: int = 0,
        profile_dir=None,
    ):
        self.cfg = cfg
        self.core_cfg = cfg.core_config()
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.mesh_data, model=cfg.mesh_model,
            stage=getattr(cfg, "mesh_stage", 1),
        )
        if getattr(cfg, "seq_shard", False) or getattr(cfg, "mesh_stage", 1) > 1:
            # sequence-parallel constraints AND the pipelined encoder's
            # shard_map both bake mesh context at trace time — register the
            # mesh before the first jitted step
            from cor_tpu.parallel import set_activation_mesh

            set_activation_mesh(self.mesh)
        self.state = jax.device_put(state, replicated(self.mesh))
        if self.mesh.shape.get("model", 1) > 1:
            # mesh_model > 1 means Megatron tensor parallelism — actually
            # apply the column/row param splits (a replicated state would
            # silently halve data parallelism and shard nothing)
            from cor_tpu.parallel import shard_params

            self.state = self.state._replace(
                params=shard_params(self.mesh, self.state.params)
            )
        if getattr(cfg, "shard_optimizer_state", False):
            from cor_tpu.parallel import shard_opt_state

            self.state = self.state._replace(
                opt_state=shard_opt_state(self.mesh, self.state.opt_state)
            )
        self.tx = tx
        self.lr_schedule = lr_schedule
        self.logger = logger
        self.writer = writer
        self.train_step = make_train_step(
            self.core_cfg, tx, grad_accum=getattr(cfg, "grad_accum", 1)
        )
        self.eval_step = make_eval_step(self.core_cfg)
        self.best = BestTracker()
        self.rng = jax.random.PRNGKey(cfg.seed)
        # async_checkpoint=True: Orbax writes the checkpoint directory in a
        # background thread while training continues (the reference blocks
        # on torch.save, trainer_v3_g.py:126-144); fit() drains on exit
        self.ckpt = CheckpointWriter(
            async_save=getattr(cfg, "async_checkpoint", False)
        )
        # --profile N: capture a jax.profiler trace of the first N train
        # steps (a GLOBAL step count — the trace spans epoch boundaries)
        self.profile_steps = profile_steps
        self.profile_dir = profile_dir
        self._profiling = False
        self._profiled_steps = 0

    # ------------------------------------------------------------------
    def train_epoch(self, loader, epoch: int) -> float:
        cfg = self.cfg
        if hasattr(loader, "set_epoch"):
            # pin shuffle order + augmentation draws to the REAL epoch
            # number so a resumed run continues the uninterrupted run's data
            # sequence instead of replaying epoch 0's
            loader.set_epoch(epoch)
        self.logger.info("=" * 35 + f" Training Epoch: {epoch} " + "=" * 35)
        lr = float(self.lr_schedule(epoch))
        # the reference's AverageMeter.average is the CUMULATIVE mean — the
        # window_size arg only feeds an unused helper (utils/utils.py:36-50)
        loss_meter = AverageMeter()
        timer = StepTimer()
        total_batches = len(loader)
        t_epoch = time.time()

        # Per-step host syncs (float(loss)) block async dispatch and
        # serialize host<->device on real TPU. Device scalars are queued and
        # only materialized at batch_record_interval boundaries, by which
        # point the in-order device queue has already computed them.
        pending: list = []

        def drain():
            for v in pending:
                loss_meter.update(float(v))
            pending.clear()

        try:
            for batch_idx, batch in enumerate(loader, start=1):
                if self.profile_steps and batch_idx == 1 and not self._profiling:
                    from pathlib import Path

                    Path(self.profile_dir).mkdir(parents=True, exist_ok=True)
                    jax.profiler.start_trace(str(self.profile_dir))
                    self._profiling = True
                    self.logger.info(
                        f"[Profile]: tracing {self.profile_steps} steps -> {self.profile_dir}"
                    )
                timer.tic()
                batch = shard_batch(self.mesh, self._device_batch(batch))
                self.state, metrics = self.train_step(
                    self.state, batch, self.rng, jnp.float32(lr)
                )
                pending.append(metrics["total_loss"])
                timer.toc()
                if self._profiling:
                    self._profiled_steps += 1
                    if self._profiled_steps >= self.profile_steps:
                        jax.block_until_ready(metrics["total_loss"])  # capture real device work
                        jax.profiler.stop_trace()
                        self._profiling = False
                        self.profile_steps = 0  # consume-once
                        self.logger.info(f"[Profile]: trace written to {self.profile_dir}")
                if batch_idx == 1 or batch_idx % cfg.batch_record_interval == 0 or batch_idx == total_batches:
                    drain()
                    self.logger.info(
                        f"[Epo: {epoch:03d}/{cfg.epoch:03d}] => "
                        f"[Batch: {batch_idx:04d}/{total_batches:04d}] => "
                        f"[BLoss: {loss_meter.value:.4f}] => [LAvgLoss: {loss_meter.average:.4f}] => "
                        f"[Lr: {lr:g}] => [ETA: {timer.eta(total_batches - batch_idx)}]"
                    )
        except KeyboardInterrupt:
            self.logger.info("[Train Info]: Keyboard Interrupt: saving and exiting!")
            self._save(f"interrupted_checkpoint_epoch_{epoch}", epoch)
            raise

        drain()
        # each step's total_loss is a mean over the GLOBAL batch (computed
        # inside the jitted step on the mesh; multi-host batches are
        # assembled into one global array by shard_batch), so the epoch mean
        # already aggregates every host's samples — the same semantics as
        # the reference's gather-weighted mean (trainer_v3_g.py:100-124)
        local_loss = loss_meter.average
        global_loss = local_loss
        duration = time.time() - t_epoch
        self.logger.info(
            f"[Train Info]: [Epoch {epoch:03d}/{cfg.epoch:03d}], "
            f"[LocalAvgLoss: {local_loss:.4f}], [GlobalAvgLoss: {global_loss:.4f}], "
            f"[Lr: {lr:g}], [Duration: {int(duration)}s]"
        )
        if self.writer is not None:
            self.writer.add_scalar("Train/LearningRate", lr, epoch)
            self.writer.add_scalar("Train/LocalTotalLoss", local_loss, epoch)
            self.writer.add_scalar("Train/GlobalTotalLoss", global_loss, epoch)
            self.writer.add_scalar("Train/EpochDuration", duration, epoch)
        if epoch % cfg.train_model_save_epoch == 0:
            self._save(f"checkpoint_epoch_{epoch}", epoch, loss=global_loss)
        return global_loss

    # ------------------------------------------------------------------
    def val_epoch(self, loader, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        self.logger.info("=" * 35 + f" Val Epoch: {epoch} " + "=" * 35)
        sums = {k: 0.0 for k in ("dice", "mae", "iou", "mdice", "miou")}
        count = 0.0
        t_epoch = time.time()
        for batch in loader:
            batch = shard_batch(self.mesh, self._device_batch(batch))
            batch_sums, n = self.eval_step(self.state.params, batch)
            for k in sums:
                sums[k] += float(batch_sums[k])
            count += float(n)
        metrics = {k: v / max(count, 1.0) for k, v in sums.items()}
        duration = time.time() - t_epoch
        self.logger.info(
            f"[Val Info]: Epoch: {epoch}, "
            + ", ".join(f"Global {k.capitalize()}: {v:.4f}" for k, v in metrics.items())
            + f", [Duration: {int(duration)}s]"
        )
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f"Val/Global{k.capitalize()}", v, epoch)
            self.writer.add_scalar("Val/EpochDuration", duration, epoch)
        if self.best.update(epoch, metrics):
            self.logger.info(
                f"[Val Info]: New best model at epoch {epoch} "
                f"(Dice+IoU = {self.best.best_score:.4f})"
            )
            # double save (reference: trainer_v3_g.py:340-356): best_model =
            # params only; best_model_full = resumable full training state
            self._save("best_model", epoch, params_only=True)
            self._save("best_model_full", epoch)
        return metrics

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader, start_epoch: int = 1):
        # Preemption safety beyond the reference (which only catches ^C,
        # trainer_v3_g.py:146-168): TPU VMs/pods are terminated with SIGTERM
        # plus a grace period — route it through the same emergency-save
        # path so a preempted run leaves an interrupted_checkpoint_epoch_N
        # to auto-resume from.
        import signal

        def _sigterm(signum, frame):
            self.logger.warning(
                "[Train Info]: SIGTERM (preemption?) — saving emergency checkpoint"
            )
            raise KeyboardInterrupt

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _sigterm)
        except ValueError:
            pass  # not the main thread (e.g. under a test runner worker)
        try:
            for epoch in range(start_epoch, self.cfg.epoch + 1):
                self.train_epoch(train_loader, epoch)
                try:
                    self.val_epoch(val_loader, epoch)
                except KeyboardInterrupt:
                    # a preemption landing during VALIDATION (a full val-split
                    # pass every epoch) must leave an emergency checkpoint
                    # too, not just one inside train_epoch. Epoch N's TRAINING
                    # is already complete here, so save a regular
                    # checkpoint_epoch_N — resume continues at N+1 instead of
                    # re-running N's optimizer updates.
                    self.logger.info(
                        "[Train Info]: Interrupt during validation: saving and exiting!"
                    )
                    self._save(f"checkpoint_epoch_{epoch}", epoch)
                    self.ckpt.wait()
                    raise
        finally:
            self.ckpt.wait()  # drain any in-flight async checkpoint write
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            if self._profiling:
                # --profile N exceeded the total number of train steps: close
                # the trace so the capture is written rather than dangling
                jax.profiler.stop_trace()
                self._profiling = False
                self.logger.info(f"[Profile]: trace written to {self.profile_dir}")
        return self.best

    # ------------------------------------------------------------------
    def _device_batch(self, batch) -> Dict[str, np.ndarray]:
        keep = ("query_img", "query_mask", "support_img", "support_mask", "text")
        # pad ON THE HOST (numpy): the loader yields numpy, and shard_batch
        # does the one host->device transfer against the mesh sharding —
        # jnp-side padding would commit the full batch to device 0 first and
        # (multi-host) pull it back to host for
        # make_array_from_process_local_data, a per-step round trip.
        out = {k: np.asarray(batch[k]) for k in keep}
        # pad to the mesh multiple (batch_size 10 on an 8-device mesh; partial
        # drop_last=False val batches) — padded rows are valid-masked out of
        # the loss and the (sum, count) eval reduction. With grad_accum each
        # of the accum scan microbatches must ITSELF shard over the data
        # axis, so the multiple is n_data * accum (lcm is NOT enough:
        # n_data=8, accum=4 -> lcm 8 -> 2-row microbatches on an 8-way axis).
        n_data = self.mesh.shape[DATA_AXIS]
        accum = max(getattr(self.cfg, "grad_accum", 1), 1)
        # with pipeline parallelism every gpipe microbatch must itself shard
        # over the data axis: B % (pp_microbatches * n_data) == 0
        pp_m = (
            max(getattr(self.cfg, "pp_microbatches", 1), 1)
            if getattr(self.cfg, "mesh_stage", 1) > 1
            else 1
        )
        multiple = n_data * accum * pp_m
        target = -(-self.cfg.batch_size // multiple) * multiple
        n = out[keep[0]].shape[0]
        size = -(-max(n, target) // multiple) * multiple
        pad = size - n
        valid = np.concatenate(
            [np.ones((n,), np.float32), np.zeros((pad,), np.float32)]
        )
        if pad:
            out = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                for k, v in out.items()
            }
        out["valid"] = valid
        return out

    def _save(self, name: str, epoch: int, loss: Optional[float] = None, params_only: bool = False):
        if params_only:
            payload = {"params": self.state.params}
        else:
            payload = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "epoch": np.int32(epoch),
                # best-tracker state rides along so a resumed run cannot
                # clobber best_model with its first (possibly worse) epoch
                "best_score": np.float32(self.best.best_score),
                "best_epoch": np.int32(self.best.best_epoch),
            }
            if loss is not None:
                payload["loss"] = np.float32(loss)
        path = self.ckpt.save(self.cfg.train_model_save_path, name, payload)
        if name.startswith("interrupted"):
            # emergency save (^C / SIGTERM): the process is about to exit —
            # the write must be durable before we re-raise
            self.ckpt.wait()
        self.logger.info(f"[Train Info]: Saved checkpoint to {path}")
