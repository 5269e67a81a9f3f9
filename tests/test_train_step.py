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
    # prompt encoder: only no_mask_embed trains; the PE gaussian matrix is a
    # buffer in the reference (my_prompt_encoder.py:186-188)
    assert all(jax.tree.leaves(mask["prompt_encoder"]["no_mask_embed"]))
    assert not any(jax.tree.leaves(mask["prompt_encoder"]["pe_layer"]))
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


def test_padded_batch_matches_unpadded(key, rng):
    """pad_batch rows are valid-masked out: loss, grads, and eval sums are
    identical to the unpadded batch (batch_size 10 on an 8-device mesh)."""
    import dataclasses

    from cor_tpu.parallel import pad_batch
    from tests.helpers import TINY_SUPPORT

    # dropout off: the dropout mask is drawn over the (padded) batch shape, so
    # padded/unpadded draws differ; padding equivalence is about the masking
    cfg = tiny_core_config(
        support_override=dataclasses.replace(TINY_SUPPORT, proj_dropout=0.0)
    )
    mesh = make_mesh()
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, lr=1e-3, epochs=5)
    train_step = make_train_step(cfg, tx)

    raw = _jax_batch(tiny_batch(rng, batch=10))  # 10 does not divide 8
    padded = pad_batch(raw, mesh.shape["data"], target=16)
    assert jax.tree.leaves(padded)[0].shape[0] == 16
    assert float(padded["valid"].sum()) == 10.0

    state_a = create_train_state(init_core_model(key, cfg), tx)
    state_a = jax.device_put(state_a, replicated(mesh))
    state_a, m_pad = train_step(state_a, shard_batch(mesh, padded), jax.random.PRNGKey(0), jnp.float32(1e-3))

    state_b = create_train_state(init_core_model(key, cfg), tx)
    state_b, m_raw = train_step(state_b, raw, jax.random.PRNGKey(0), jnp.float32(1e-3))
    np.testing.assert_allclose(
        float(m_pad["total_loss"]), float(m_raw["total_loss"]), rtol=2e-4
    )
    # updated trainable params agree (gradients were padding-free)
    for a, b in zip(
        jax.tree.leaves(state_a.params["support_branch"]["cir_fuse"]),
        jax.tree.leaves(state_b.params["support_branch"]["cir_fuse"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # eval reduction: padded rows excluded from (sum, count)
    eval_step = make_eval_step(cfg)
    sums_p, n_p = eval_step(state_b.params, padded)
    sums_r, n_r = eval_step(state_b.params, raw)
    assert float(n_p) == float(n_r) == 10.0
    for k in sums_r:
        np.testing.assert_allclose(float(sums_p[k]), float(sums_r[k]), rtol=1e-5)


def _no_dropout_cfg():
    import dataclasses

    from tests.helpers import TINY_SUPPORT

    return tiny_core_config(
        support_override=dataclasses.replace(TINY_SUPPORT, proj_dropout=0.0)
    )


def _deterministic_cfg():
    """Fully deterministic forward: proj_dropout 0 AND the 'add' fusion
    ablation — cir_fuse_compose carries the reference Combiner's hard-coded
    0.5 dropout (fusion.py:51), whose draws depend on the batch SHAPE, so
    any full-batch == microbatched comparison needs it out of the graph."""
    import dataclasses

    from tests.helpers import TINY_SUPPORT

    return tiny_core_config(
        support_override=dataclasses.replace(
            TINY_SUPPORT, proj_dropout=0.0, fusion="add"
        )
    )


def _manual_accum_step(cfg, tx, params, batch, rng_key, lr, accum, bounds=None):
    """Hand-rolled grad accumulation: per-microbatch value_and_grad with the
    step's key folding, valid-count-weighted average, one tx.update.
    ``bounds``: explicit [(start, end)] microbatch row ranges (defaults to
    equal splits)."""
    from cor_tpu.models.core_model import core_forward
    from cor_tpu.train.losses import core_total_loss
    from cor_tpu.train.step import _write_lr
    import optax

    def loss_fn(p, mb, k):
        pred, qemb, sfeat = core_forward(
            p, mb["query_img"], mb["support_img"], mb["text"], mb["support_mask"],
            cfg, key=k, train=True,
        )
        return core_total_loss(
            jnp.transpose(pred, (0, 2, 3, 1)), mb["query_mask"], qemb, sfeat,
            valid=mb.get("valid"),
        )

    b = jax.tree.leaves(batch)[0].shape[0]
    if bounds is None:
        bounds = [(a * (b // accum), (a + 1) * (b // accum)) for a in range(accum)]
    key = jax.random.fold_in(rng_key, jnp.int32(0))  # state.step == 0
    g_acc, w_acc, loss_acc = None, 0.0, 0.0
    for a in range(accum):
        lo, hi = bounds[a]
        mb = jax.tree.map(lambda x: x[lo:hi], batch)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, jax.random.fold_in(key, a)
        )
        w = float(mb["valid"].sum()) if "valid" in mb else float(hi - lo)
        g = jax.tree.map(lambda x: np.asarray(x, np.float32) * w, g)
        g_acc = g if g_acc is None else jax.tree.map(np.add, g_acc, g)
        w_acc += w
        loss_acc += w * float(loss)
    grads = jax.tree.map(lambda x: jnp.asarray(x / w_acc), g_acc)
    opt_state = _write_lr(tx.init(params), jnp.float32(lr))
    updates, _ = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), loss_acc / w_acc, grads


def test_grad_accum_matches_manual_accumulation(key, rng):
    """The grad_accum=2 scan produces exactly the hand-rolled weighted
    accumulation (same key folding, same weighting, one update). The bg term
    is batch-coupled (losses.py broadcast quirk), so accum == unsplit does
    NOT hold for the total — the machinery is pinned against manual
    accumulation instead, and the decomposable terms against the unsplit
    step below."""
    cfg = _no_dropout_cfg()
    batch = _jax_batch(tiny_batch(rng, batch=4))
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, optimizer="AdamW", lr=1e-3, epochs=5)

    state = create_train_state(init_core_model(key, cfg), tx)
    step = make_train_step(cfg, tx, grad_accum=2)
    state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-3))

    manual_params, manual_loss, _ = _manual_accum_step(
        cfg, tx, init_core_model(key, cfg), batch, jax.random.PRNGKey(0), 1e-3, 2
    )
    np.testing.assert_allclose(float(metrics["total_loss"]), manual_loss, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(manual_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_grad_accum_decomposable_terms_match_unsplit(key, rng):
    """seg (valid-weighted) and fg (all masks nonempty) decompose exactly
    over microbatches; bg intentionally reflects the per-microbatch contrast
    batch (reference broadcast quirk couples samples)."""
    cfg = _deterministic_cfg()
    batch = _jax_batch(tiny_batch(rng, batch=4))
    qm = np.asarray(batch["query_mask"])
    assert (qm.sum(axis=(1, 2, 3)) > 0).all() and ((1 - qm).sum(axis=(1, 2, 3)) > 0).all()
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, optimizer="AdamW", lr=1e-3, epochs=5)

    state_a = create_train_state(init_core_model(key, cfg), tx)
    _, m_a = make_train_step(cfg, tx, grad_accum=1)(
        state_a, batch, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    state_b = create_train_state(init_core_model(key, cfg), tx)
    _, m_b = make_train_step(cfg, tx, grad_accum=2)(
        state_b, batch, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    np.testing.assert_allclose(float(m_a["seg_loss"]), float(m_b["seg_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_a["fg_loss"]), float(m_b["fg_loss"]), rtol=1e-5)
    assert np.isfinite(float(m_b["bg_loss"]))


def test_grad_accum_padding_invariance(key, rng):
    """(a) Machinery on a PADDED batch: the scan == manual accumulation on
    the same padded microbatches (identical graphs — near-bitwise params).
    (b) Padding invariance of the accumulated GRADIENT: manual accumulation
    on the padded microbatches == on the unpadded rows at matching
    boundaries (every term's reductions are valid-masked, bg's column sums
    included). Gradients, not post-AdamW params, are compared across the
    different batch shapes — AdamW's first step amplifies reassociation-
    scale grad deltas to ~±lr (same reasoning as the trajectory-parity
    tolerances). SGD here for the same reason — its update is lr*grad, so
    param equality IS grad equality (AdamW machinery is pinned by
    test_grad_accum_matches_manual_accumulation)."""
    from cor_tpu.parallel import pad_batch

    cfg = _deterministic_cfg()
    raw = _jax_batch(tiny_batch(rng, batch=6))
    padded = pad_batch(raw, 4, target=8)  # microbatches: rows 0-3, rows 4-7(2 pad)
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, optimizer="SGD", lr=1e-3, epochs=5)

    state = create_train_state(init_core_model(key, cfg), tx)
    step = make_train_step(cfg, tx, grad_accum=2)
    state, metrics = step(state, padded, jax.random.PRNGKey(0), jnp.float32(1e-3))

    manual_pad, loss_pad, g_pad = _manual_accum_step(
        cfg, tx, init_core_model(key, cfg), padded, jax.random.PRNGKey(0), 1e-3, 2
    )
    np.testing.assert_allclose(float(metrics["total_loss"]), loss_pad, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(manual_pad)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )

    # (b): pad rows contribute nothing — the accumulated gradient equals the
    # unpadded computation at the matching boundaries (weights 4 and 2)
    _, loss_raw, g_raw = _manual_accum_step(
        cfg, tx, init_core_model(key, cfg), raw, jax.random.PRNGKey(0), 1e-3, 2,
        bounds=[(0, 4), (4, 6)],
    )
    np.testing.assert_allclose(loss_pad, loss_raw, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_pad)[0],
        jax.tree_util.tree_flatten_with_path(g_raw)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(kp),
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


def test_unfrozen_full_fine_tune_step(key, rng):
    """CoreConfig(freeze_towers=False) + make_optimizer(freeze_towers=False):
    the reference-frozen towers receive real updates (possible because the
    fused Pallas kernels carry oracle-VJP custom_vjps — cor_tpu.ops.diff),
    while the PE gaussian buffer stays bit-frozen."""
    import dataclasses

    cfg = dataclasses.replace(tiny_core_config(), freeze_towers=False)
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, optimizer="AdamW", lr=3e-3, freeze_towers=False)
    state = create_train_state(params, tx)
    train_step = make_train_step(cfg, tx)
    batch = _jax_batch(tiny_batch(rng, batch=2))

    enc_before = jax.tree.map(np.asarray, state.params["image_encoder"])
    sig_before = jax.tree.map(np.asarray, state.params["support_branch"]["siglip"])
    pe_before = jax.tree.map(np.asarray, state.params["prompt_encoder"]["pe_layer"])

    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), jnp.float32(3e-3))
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)

    def _changed(before, after):
        return any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        )

    assert _changed(enc_before, state.params["image_encoder"]), (
        "unfrozen image encoder received no update"
    )
    assert _changed(sig_before, state.params["support_branch"]["siglip"]), (
        "unfrozen SigLIP received no update"
    )
    # the PE gaussian matrix is a buffer — frozen even in full fine-tune
    for a, b in zip(
        jax.tree.leaves(pe_before),
        jax.tree.leaves(state.params["prompt_encoder"]["pe_layer"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
