"""Train-step tests: loss decreases, frozen params stay exactly frozen,
value clipping applies, and the step runs sharded over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import init_core_model
from cor_tpu.parallel import make_mesh, shard_batch, replicated
from cor_tpu.train.optim import count_params, make_optimizer, trainable_mask
from cor_tpu.train.step import create_train_state, make_eval_step, make_train_step
from tests.helpers import tiny_batch, tiny_core_config


def _jax_batch(b):
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_trainable_mask_freezes_reference_partitions(key):
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    mask = trainable_mask(params)
    # whole frozen towers
    assert not any(jax.tree.leaves(mask["image_encoder"]))
    assert not any(jax.tree.leaves(mask["support_branch"]["siglip"]))
    assert not any(jax.tree.leaves(mask["mask_decoder"]["iou_prediction_head"]))
    # trainable surface
    assert all(jax.tree.leaves(mask["support_branch"]["cir_fuse"]))
    assert all(jax.tree.leaves(mask["support_branch"]["dim_proj"]))
    assert all(jax.tree.leaves(mask["mask_decoder"]["transformer"]))
    assert all(jax.tree.leaves(mask["prompt_encoder"]))
    n_train = count_params(params, mask)
    n_total = count_params(params)
    assert 0 < n_train < n_total


def test_train_step_decreases_loss_and_respects_freezing(key, rng):
    # proj_dropout=0: the reference's 0.8 dropout makes per-step loss far too
    # noisy on a tiny model to assert monotonic descent; dropout activity is
    # covered by test_core_forward_dropout_active_in_train.
    import dataclasses

    from tests.helpers import TINY_SUPPORT

    cfg = tiny_core_config(
        support_override=dataclasses.replace(TINY_SUPPORT, proj_dropout=0.0)
    )
    params = init_core_model(key, cfg)
    tx, sched = make_optimizer(params, optimizer="AdamW", lr=3e-3, epochs=5)
    state = create_train_state(params, tx)
    train_step = make_train_step(cfg, tx)

    batch = _jax_batch(tiny_batch(rng, batch=2))
    rng_key = jax.random.PRNGKey(1)

    # snapshot to host before stepping — the train step donates its input state
    frozen_before = jax.tree.map(np.asarray, state.params["image_encoder"])
    iou_before = jax.tree.map(
        np.asarray, state.params["mask_decoder"]["iou_prediction_head"]
    )
    fuse_before = jax.tree.map(np.asarray, state.params["support_branch"]["cir_fuse"])

    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch, rng_key, jnp.float32(3e-3))
        losses.append(float(metrics["total_loss"]))

    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 8

    # frozen partitions bit-identical
    for a, b in zip(
        jax.tree.leaves(frozen_before), jax.tree.leaves(state.params["image_encoder"])
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(iou_before),
        jax.tree.leaves(state.params["mask_decoder"]["iou_prediction_head"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    # trainable partition moved
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(fuse_before),
            jax.tree.leaves(state.params["support_branch"]["cir_fuse"]),
        )
    )
    assert moved


def test_train_step_on_8_device_mesh(key, rng):
    """DP over the full CPU mesh: batch sharded on data axis, params replicated."""
    cfg = tiny_core_config()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, lr=1e-3, epochs=5)
    state = create_train_state(params, tx)
    state = jax.device_put(state, replicated(mesh))
    train_step = make_train_step(cfg, tx)

    batch = shard_batch(mesh, _jax_batch(tiny_batch(rng, batch=16)))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["total_loss"]))

    # sharded result must equal the single-device computation
    state2 = create_train_state(init_core_model(key, cfg), tx)
    batch_local = _jax_batch(tiny_batch(np.random.default_rng(0), batch=16))
    train_step2 = make_train_step(cfg, tx)
    state2, metrics2 = train_step2(
        state2, batch_local, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(metrics2["total_loss"]), rtol=1e-4
    )


def test_eval_step_returns_weighted_sums(key, rng):
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    eval_step = make_eval_step(cfg)
    batch = _jax_batch(tiny_batch(rng, batch=4))
    sums, count = eval_step(params, batch)
    assert float(count) == 4.0
    for k in ("dice", "mae", "iou", "mdice", "miou"):
        assert np.isfinite(float(sums[k]))
        assert 0.0 <= float(sums[k]) / 4.0 <= 1.0
