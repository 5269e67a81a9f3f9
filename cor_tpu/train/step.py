"""Jitted train / eval steps over a device mesh.

TPU-native replacement for the reference's Accelerate-wrapped loop
(reference: utils/trainer_v3_g.py:21-170): ONE compiled graph per step —
forward (bf16) + loss (fp32) + backward + value-clip + masked optimizer
update. Data parallelism comes from sharding the batch over the mesh's
`data` axis; XLA inserts the gradient all-reduce over ICI (the DDP
equivalent of `accelerator.backward`).

Eval steps return per-batch (sum, count) pairs so the trainer's cross-host
aggregation has exactly the reference's weighted-gather semantics
(trainer_v3_g.py:271-290).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from cor_tpu.models.core_model import CoreConfig, core_forward
from cor_tpu.train.losses import core_total_loss
from cor_tpu.train.metrics import all_soft_metrics, normalize_prediction
from cor_tpu.ops.resize import resize_bilinear


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 global step


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: CoreConfig, tx: optax.GradientTransformation, grad_accum: int = 1
):
    """Returns train_step(state, batch, rng, lr) -> (state, metrics).

    ``grad_accum > 1`` (a cor_tpu scaling addition — the reference always
    takes one optimizer step per loader batch, trainer_v3_g.py:21-97) splits
    the batch into ``grad_accum`` microbatches, accumulates their gradients
    under one ``lax.scan`` (so only one microbatch's activations are ever
    live — the lever that lets an UNFROZEN fine-tune reach large effective
    batches within HBM), and applies a single optimizer update. Microbatch
    gradients are weighted by their valid-row counts, so with mesh padding
    the accumulated gradient of the pixel loss equals the unsplit batch's
    exactly (the fg term too, whenever every sample has a nonempty mask).
    The bg term is batch-COUPLED by construction — the reference's broadcast
    quirk column-sums support features over the whole batch
    (losses.py:126-133) — so under accumulation its effective contrast batch
    is the microbatch, the standard semantics for in-batch contrastive
    losses under grad accumulation. Dropout (cir_fuse's 0.5, dim_proj's
    0.8) draws per-microbatch keys, so a stochastic accumulated step is not
    bit-equal to the unsplit one either — same as any framework. Tests pin
    the accumulation machinery against manual per-microbatch accumulation,
    the decomposable terms against the unsplit step (deterministic mode),
    and padding invariance.
    """

    def loss_fn(params, batch, key):
        pred, qemb, sfeat = core_forward(
            params,
            batch["query_img"],
            batch["support_img"],
            batch["text"],
            batch["support_mask"],
            cfg,
            key=key,
            train=True,
        )
        # NCHW-style [B, 1, H, W] logits -> NHWC for the loss
        pred_nhwc = jnp.transpose(pred, (0, 2, 3, 1))
        total, aux = core_total_loss(
            pred_nhwc, batch["query_mask"], qemb, sfeat, valid=batch.get("valid")
        )
        return total, aux

    def accumulate(params, batch, key):
        """(grads, aux) for the whole batch via grad_accum microbatches."""
        b = jax.tree.leaves(batch)[0].shape[0]
        assert b % grad_accum == 0, (
            f"batch {b} not divisible by grad_accum={grad_accum} "
            "(the trainer pads to n_data * grad_accum)"
        )
        micro = jax.tree.map(
            lambda x: x.reshape(grad_accum, b // grad_accum, *x.shape[1:]), batch
        )

        def body(carry, inp):
            g_acc, m_acc, w_acc = carry
            mb, a = inp
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(key, a)
            )
            valid = mb.get("valid")
            w = (
                jnp.sum(valid.astype(jnp.float32))
                if valid is not None
                else jnp.float32(b // grad_accum)
            )
            g_acc = jax.tree.map(lambda acc, gi: acc + w * gi.astype(acc.dtype), g_acc, g)
            m_acc = {k: m_acc[k] + w * aux[k] for k in m_acc}
            return (g_acc, m_acc, w_acc + w), None

        g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        # aux keys/structure: trace one microbatch abstractly via eval_shape
        aux_shape = jax.eval_shape(
            lambda p, mb: loss_fn(p, mb, key)[1],
            params,
            jax.tree.map(lambda x: x[0], micro),
        )
        m0 = {k: jnp.zeros((), jnp.float32) for k in aux_shape}
        (g_acc, m_acc, w_acc), _ = jax.lax.scan(
            body, (g0, m0, jnp.float32(0.0)), (micro, jnp.arange(grad_accum))
        )
        w = jnp.maximum(w_acc, 1.0)
        grads = jax.tree.map(lambda g, p: (g / w).astype(p.dtype), g_acc, params)
        aux = {k: v / w for k, v in m_acc.items()}
        return grads, aux

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array, lr: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        key = jax.random.fold_in(rng, state.step)
        if grad_accum > 1:
            grads, aux = accumulate(state.params, batch, key)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, key
            )
        opt_state = _write_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _write_lr(opt_state, lr):
    """Set the injected learning_rate hyperparam inside the masked chain."""

    def visit(state):
        if isinstance(state, optax.MaskedState):
            return optax.MaskedState(inner_state=visit(state.inner_state))
        if hasattr(state, "hyperparams"):
            h = dict(state.hyperparams)
            h["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return state._replace(hyperparams=h)
        if isinstance(state, tuple) and type(state) is tuple:
            return tuple(visit(s) for s in state)
        return state

    return visit(opt_state)


def make_eval_step(cfg: CoreConfig):
    """Returns eval_step(params, batch) -> {metric: sum}, count.

    Mirrors val_stage preprocessing: upsample logits to GT resolution,
    sigmoid, per-sample min-max renorm, then the 5 soft metrics
    (reference: trainer_v3_g.py:210-243).
    """

    @jax.jit
    def eval_step(params, batch):
        pred, _, _ = core_forward(
            params,
            batch["query_img"],
            batch["support_img"],
            batch["text"],
            batch["support_mask"],
            cfg,
            train=False,
        )
        pred_nhwc = jnp.transpose(pred, (0, 2, 3, 1))
        gt = batch["query_mask"].astype(jnp.float32)
        pred_nhwc = resize_bilinear(pred_nhwc, gt.shape[1:3])
        prob = normalize_prediction(pred_nhwc)
        per_sample = all_soft_metrics(prob, gt)
        # mesh-padding rows (pad_batch) are weighted out of the (sum, count)
        # reduction so partial drop_last=False val batches leave metrics exact
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((gt.shape[0],), jnp.float32)
        valid = valid.astype(jnp.float32)
        sums = {k: jnp.sum(v * valid) for k, v in per_sample.items()}
        count = jnp.sum(valid)
        return sums, count

    return eval_step


def make_predict_step(cfg: CoreConfig):
    """Returns predict(params, batch) -> normalized probabilities [B, H, W, 1]
    at the low-res (256^2 for the flagship) grid — the validator upsamples
    per-sample to native GT size on the host (reference: vailder.py:400-476)."""

    @jax.jit
    def predict(params, batch):
        pred, _, _ = core_forward(
            params,
            batch["query_img"],
            batch["support_img"],
            batch["text"],
            batch["support_mask"],
            cfg,
            train=False,
        )
        pred_nhwc = jnp.transpose(pred, (0, 2, 3, 1))
        return normalize_prediction(pred_nhwc)

    return predict
