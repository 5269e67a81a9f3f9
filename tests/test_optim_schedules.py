"""LR-schedule parity against the reference's torch schedulers.

The reference constructs (my_train_a.py:141-173):
- CosineAnnealingLR(T_max=epochs, eta_min=0.1*lr)
- CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=0.1*lr)
- timm CosineLRScheduler(t_initial=epochs-5, lr_min=0.1*lr, warmup_t=5,
  warmup_lr_init=0.1*lr, warmup_prefix=True)  [timm not installed here:
  hand-computed oracle]
- ExponentialLR(gamma=0.95)
and steps them once per epoch before train_stage (my_train_a.py:252-259).
"""

import numpy as np
import pytest
import torch

from cor_tpu.train.optim import make_lr_schedule

EPOCHS = 15
LR = 1e-4


def _torch_lrs(scheduler_ctor, epochs=EPOCHS):
    """Simulate the reference loop: scheduler.step() before each epoch's
    training, returning {epoch: lr used for that epoch}."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=LR)
    sched = scheduler_ctor(opt)
    out = {}
    for epoch in range(1, epochs + 1):
        sched.step()
        out[epoch] = opt.param_groups[0]["lr"]
    return out


def test_cosine_annealing_matches_torch():
    ours = make_lr_schedule("CosineAnnealingLR", LR, EPOCHS)
    ref = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=EPOCHS, eta_min=0.1 * LR)
    )
    for e, lr in ref.items():
        np.testing.assert_allclose(float(ours(e)), lr, rtol=1e-6)


def test_warm_restarts_matches_torch():
    ours = make_lr_schedule("CosineAnnealingWarmRestarts", LR, EPOCHS)
    ref = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            o, T_0=10, T_mult=2, eta_min=0.1 * LR
        ),
        epochs=40,
    )
    for e, lr in ref.items():
        np.testing.assert_allclose(float(ours(e)), lr, rtol=1e-5)


def test_exponential_matches_torch():
    ours = make_lr_schedule("ExponentialLR", LR, EPOCHS)
    ref = _torch_lrs(lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.95))
    for e, lr in ref.items():
        np.testing.assert_allclose(float(ours(e)), lr, rtol=1e-6)


def test_timm_cosine_semantics():
    """timm CosineLRScheduler(t_initial=10, lr_min=warmup_lr_init=0.1*lr,
    warmup_t=5, warmup_prefix=True), stepped with .step(epoch): linear warmup
    0.1*lr -> lr over epochs 0..5, then cosine lr -> 0.1*lr over 10 epochs."""
    ours = make_lr_schedule("TimmCosineLRScheduler", LR, EPOCHS)
    eta = 0.1 * LR
    for e in range(0, EPOCHS + 1):
        if e < 5:
            want = eta + (LR - eta) * e / 5
        else:
            t = min((e - 5) / (EPOCHS - 5), 1.0)
            want = eta + 0.5 * (LR - eta) * (1 + np.cos(np.pi * t))
        np.testing.assert_allclose(float(ours(e)), want, rtol=1e-6)
    # alias accepted
    alias = make_lr_schedule("CosineLRScheduler", LR, EPOCHS)
    np.testing.assert_allclose(float(alias(7)), float(ours(7)))


def test_step_decay_matches_reference_adjust_lr():
    """adjust_lr (reference utils/utils.py:136-139): lr = init_lr *
    decay_rate ** (epoch // decay_epoch), with train_config_m3.yaml's
    lr_decay_rate=0.1 / lr_decay_epoch=50."""
    ours = make_lr_schedule("StepLR", LR, EPOCHS, lr_decay_rate=0.1, lr_decay_epoch=5)
    for e in range(0, 16):
        want = LR * 0.1 ** (e // 5)
        np.testing.assert_allclose(float(ours(e)), want, rtol=1e-6)
    alias = make_lr_schedule("adjust_lr", LR, EPOCHS, lr_decay_rate=0.5, lr_decay_epoch=3)
    np.testing.assert_allclose(float(alias(7)), LR * 0.5**2, rtol=1e-6)


def test_none_schedule_constant():
    ours = make_lr_schedule("None", LR, EPOCHS)
    assert float(ours(1)) == float(ours(15))
    np.testing.assert_allclose(float(ours(1)), LR, rtol=1e-6)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_lr_schedule("NotAScheduler", LR, EPOCHS)
