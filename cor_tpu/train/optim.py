"""Optimizer construction: optax pipelines mirroring the reference's choices.

Parity targets:
- optimizer selection {Adam, AdamW, SGD+momentum 0.9}
  (reference: my_train_a.py:124-139; torch AdamW default weight_decay=1e-2,
  torch Adam/AdamW default eps=1e-8, betas=(0.9, 0.999)).
- schedulers {CosineAnnealingLR, CosineAnnealingWarmRestarts,
  timm CosineLRScheduler with 5-epoch warmup, ExponentialLR, None}
  (reference: my_train_a.py:141-173) — realized as optax schedules stepped
  per-epoch exactly like the reference's `scheduler.step(epoch)` — plus
  StepLR/adjust_lr exposing the reference's defined-but-uncalled step decay
  (utils/utils.py:136-139).
- gradient value-clipping (NOT norm clipping): the reference's clip_gradient
  clamps each gradient element to [-clip, clip] (reference: utils/utils.py:121-133).
- parameter freezing via requires_grad filtering (reference:
  lib/build_model.py:112-120; my_train_a.py:118-121) — realized as an
  optax.masked partition over the param tree (ZeRO-friendly: frozen leaves
  carry no optimizer state at all).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# freezing
# ---------------------------------------------------------------------------

FROZEN_PREFIXES = (
    # whole frozen towers (reference: build_model.py:112-117)
    ("image_encoder",),
    ("support_branch", "siglip"),
    # frozen IoU quality head (reference: build_model.py:118-120)
    ("mask_decoder", "iou_prediction_head"),
    # the random-Fourier PE gaussian matrix is a registered BUFFER in the
    # reference — never optimized (my_prompt_encoder.py:186-188). Only
    # no_mask_embed in the prompt encoder receives updates.
    ("prompt_encoder", "pe_layer"),
)

# full fine-tune (CoreConfig.freeze_towers=False): everything trains except
# true buffers
BUFFER_PREFIXES = (("prompt_encoder", "pe_layer"),)


def _path_tuple(path) -> tuple:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        else:
            out.append(str(k))
    return tuple(out)


def is_trainable(path, freeze_towers: bool = True) -> bool:
    pt = _path_tuple(path)
    prefixes = FROZEN_PREFIXES if freeze_towers else BUFFER_PREFIXES
    for prefix in prefixes:
        if pt[: len(prefix)] == prefix:
            return False
    return True


def trainable_mask(params, freeze_towers: bool = True) -> Any:
    """Pytree of bools: True where the leaf receives updates."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path, freeze_towers), params
    )


def count_params(params, mask=None) -> int:
    leaves = jax.tree.leaves(params)
    if mask is None:
        return sum(int(l.size) for l in leaves)
    flags = jax.tree.leaves(mask)
    return sum(int(l.size) for l, f in zip(leaves, flags) if f)


# ---------------------------------------------------------------------------
# value clipping (clamp, not norm — utils/utils.py:121-133)
# ---------------------------------------------------------------------------


def clip_by_value(clip: float) -> optax.GradientTransformation:
    """Element-wise clamp to [-clip, clip] — exactly ``optax.clip``, kept as
    a named alias because the reference's `clip_gradient` clamps VALUES, not
    norms (utils/utils.py:121-133), and the name documents that choice."""
    return optax.clip(clip)


# ---------------------------------------------------------------------------
# epoch-level schedules (the reference steps schedulers per epoch)
# ---------------------------------------------------------------------------


def make_lr_schedule(
    name: str,
    base_lr: float,
    epochs: int,
    lr_decay_rate: float = 0.1,
    lr_decay_epoch: int = 50,
) -> Callable[[jax.Array], jax.Array]:
    """Returns lr(epoch). Epoch indexing matches the reference's
    `scheduler.step(epoch)` with epochs starting at 1 (my_train_a.py:252-259).
    """
    name = str(name)
    eta_min = 0.1 * base_lr  # every reference scheduler floors at 0.1*lr

    def cosine(epoch):
        # CosineAnnealingLR(T_max=epochs, eta_min=0.1*lr) (my_train_a.py:146)
        t = jnp.clip(epoch, 0, epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t / epochs))

    def cosine_warm_restarts(epoch, t0=10, t_mult=2.0):
        # CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=0.1*lr)
        # per-epoch closed form (my_train_a.py:151)
        e = jnp.asarray(epoch, jnp.float32)
        n = jnp.floor(jnp.log2(e / t0 * (t_mult - 1.0) + 1.0))
        t_start = t0 * (t_mult**n - 1.0) / (t_mult - 1.0)
        t_i = t0 * t_mult**n
        t_cur = e - t_start
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))

    def timm_cosine(epoch, warmup=5):
        # timm CosineLRScheduler(t_initial=epochs-5, lr_min=0.1*lr, warmup_t=5,
        # warmup_lr_init=0.1*lr, warmup_prefix=True) (my_train_a.py:156-164):
        # linear warmup 0.1*lr -> lr over 5 epochs, then cosine to 0.1*lr over
        # the remaining epochs (warmup_prefix shifts the cosine clock by 5).
        e = jnp.asarray(epoch, jnp.float32)
        warm = eta_min + (base_lr - eta_min) * e / warmup
        t = (e - warmup) / jnp.maximum(epochs - warmup, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * jnp.clip(t, 0, 1)))
        return jnp.where(e < warmup, warm, cos)

    def exponential(epoch):
        return base_lr * (0.95**epoch)  # reference gamma=0.95 (my_train_a.py:168)

    def step_decay(epoch):
        # adjust_lr(optimizer, init_lr, epoch, decay_rate, decay_epoch)
        # (reference utils/utils.py:136-139, fed by train_config_m3.yaml's
        # lr_decay_rate/lr_decay_epoch; defined-but-uncalled in the reference
        # loop — exposed here as a selectable scheduler)
        e = jnp.asarray(epoch, jnp.int32)
        return base_lr * lr_decay_rate ** jnp.asarray(e // lr_decay_epoch, jnp.float32)

    if name == "CosineAnnealingLR":
        return cosine
    if name == "CosineAnnealingWarmRestarts":
        return cosine_warm_restarts
    if name in ("TimmCosineLRScheduler", "CosineLRScheduler"):
        return timm_cosine
    if name == "ExponentialLR":
        return exponential
    if name in ("StepLR", "adjust_lr"):
        if lr_decay_epoch <= 0:
            raise ValueError(f"StepLR needs lr_decay_epoch > 0, got {lr_decay_epoch}")
        return step_decay
    if name in ("None", "none", ""):
        return lambda epoch: jnp.asarray(base_lr, jnp.float32)
    raise ValueError(f"Unknown lr_scheduler: {name}")


# ---------------------------------------------------------------------------
# optimizer factory
# ---------------------------------------------------------------------------


def make_optimizer(
    params,
    optimizer: str = "AdamW",
    lr: float = 1e-4,
    lr_scheduler: str = "None",
    epochs: int = 15,
    gradient_clip: float = 0.5,
    weight_decay: float = 1e-2,
    freeze_towers: bool = True,
    lr_decay_rate: float = 0.1,
    lr_decay_epoch: int = 50,
) -> tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_schedule). The transformation expects an `epoch` value
    injected via optax.inject_hyperparams-style state: we use a schedule on a
    step counter that the trainer maps to epochs (one optimizer "scale" per
    update, using the current epoch's LR like the reference).
    """
    schedule = make_lr_schedule(lr_scheduler, lr, epochs, lr_decay_rate, lr_decay_epoch)

    if optimizer == "AdamW":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(
                learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
            )
        )(learning_rate=lr)
    elif optimizer == "Adam":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        )(learning_rate=lr)
    elif optimizer == "SGD":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
        )(learning_rate=lr)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")

    tx = optax.chain(clip_by_value(gradient_clip), base)
    tx = optax.masked(tx, trainable_mask(params, freeze_towers))
    return tx, schedule
