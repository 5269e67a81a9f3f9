"""Pipeline parallelism (GPipe over the `stage` mesh axis): pipelined ==
sequential to float tolerance — schedule/placement only, never semantics.
New capability; the reference's only distribution is DDP/DeepSpeed
(my_train_a.py:69,198-222)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cor_tpu.models.sam_encoder import (
    SamEncoderConfig,
    init_sam_encoder,
    sam_encoder,
)
from cor_tpu.parallel import make_mesh
from cor_tpu.parallel.pipeline import (
    gpipe,
    pipelined_sam_encoder,
    shard_stage_params,
    split_stages,
)

# depth 4 with global blocks at (1, 3): the (windowed, global) pattern
# repeats every 2 blocks -> 2 homogeneous stages (the same structure every
# SAM size has with 4 stages)
PP_ENCODER = SamEncoderConfig(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=4,
    num_heads=2,
    out_chans=16,
    window_size=2,
    global_attn_indexes=(1, 3),
)


def test_split_stages_stacks_and_rejects_heterogeneous(key):
    p = init_sam_encoder(key, PP_ENCODER)
    pattern = [0 if i in PP_ENCODER.global_attn_indexes else PP_ENCODER.window_size for i in range(4)]

    stacked, stage_pattern = split_stages(p["blocks"], pattern, 2)
    assert stage_pattern == (PP_ENCODER.window_size, 0)
    assert len(stacked) == 2  # blocks per stage
    for leaf in jax.tree.leaves(stacked[0]):
        assert leaf.shape[0] == 2  # leading stage axis

    # 4 stages of 1 block each alternate (w,), (g,) — not homogeneous
    with pytest.raises(AssertionError, match="not homogeneous"):
        split_stages(p["blocks"], pattern, 4)


def test_gpipe_matches_sequential_on_plain_blocks(key):
    """gpipe on a synthetic shape-preserving stage_fn == sequential apply."""
    mesh = make_mesh(data=4, model=1, stage=2)
    S, B, M = 2, 8, 2
    ws = jax.random.normal(key, (S, 16, 16)) * 0.3
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, 16))

    def stage_fn(w, xx):
        return jnp.tanh(xx @ w)

    seq = x
    for s in range(S):
        seq = stage_fn(ws[s], seq)

    out = gpipe(stage_fn, ws, x, mesh, n_microbatches=M)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=1e-6)


def test_pipelined_sam_encoder_matches_sequential(key, rng):
    mesh = make_mesh(data=4, model=1, stage=2)
    params = init_sam_encoder(key, PP_ENCODER)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3)).astype(np.float32))

    ref = jax.jit(lambda p, xx: sam_encoder(p, xx, PP_ENCODER))(params, x)

    pp = jax.jit(
        lambda p, xx: pipelined_sam_encoder(p, xx, PP_ENCODER, mesh, n_microbatches=2)
    )(params, x)

    np.testing.assert_allclose(np.asarray(pp), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gpipe_gradients_match_sequential(key):
    """JAX AD differentiates THROUGH the pipeline schedule (the scan/
    ppermute transpose): d(loss)/d(stage weights) and d(loss)/d(input) of
    the gpipe forward == the sequential chain's gradients."""
    mesh = make_mesh(data=4, model=1, stage=2)
    S, B, M = 2, 8, 2
    ws = jax.random.normal(key, (S, 16, 16)) * 0.3
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, 16))

    def stage_fn(w, xx):
        return jnp.tanh(xx @ w)

    def loss_seq(ws, x):
        for s in range(S):
            x = stage_fn(ws[s], x)
        return jnp.sum(x**2)

    def loss_pp(ws, x):
        return jnp.sum(gpipe(stage_fn, ws, x, mesh, n_microbatches=M) ** 2)

    (l_s, (gw_s, gx_s)) = jax.value_and_grad(loss_seq, argnums=(0, 1))(ws, x)
    (l_p, (gw_p, gx_p)) = jax.jit(jax.value_and_grad(loss_pp, argnums=(0, 1)))(ws, x)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-5, rtol=1e-5)


def test_gpipe_tp_composed_matches_sequential(key):
    """PP x TP x DP on one (data=2, model=2, stage=2) mesh: gpipe's
    shard_map is manual only over stage/data (the ppermute schedule and the
    per-device microbatch rows) while `model` stays a GSPMD auto axis, so
    tensor-parallel weight shardings and activation constraints partition
    the stage body's GEMMs. Forward AND gradients match the sequential
    unsharded chain — composition is placement-only, never semantics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=2, model=2, stage=2)
    S, B, M, D = 2, 8, 2, 16
    ws = jax.random.normal(key, (S, D, D)) * 0.3
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, D))

    def stage_fn(w, xx):
        y = xx @ w
        # TP activation constraint over the auto `model` axis inside the
        # manual-over-stage/data body — the PP x TP composition point
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, P(None, "model"))
        )
        return jnp.tanh(y)

    def loss_seq(ws, x):
        for s in range(S):
            x = jnp.tanh(x @ ws[s])
        return jnp.sum(x**2)

    def loss_pp(ws, x):
        return jnp.sum(gpipe(stage_fn, ws, x, mesh, n_microbatches=M) ** 2)

    # stage axis manual (gpipe in_spec) + model-axis TP sharding riding
    # through to GSPMD: last axis of each stage's weight over `model`
    ws_tp = jax.device_put(ws, NamedSharding(mesh, P("stage", None, "model")))
    (l_s, (gw_s, gx_s)) = jax.value_and_grad(loss_seq, argnums=(0, 1))(ws, x)
    (l_p, (gw_p, gx_p)) = jax.jit(jax.value_and_grad(loss_pp, argnums=(0, 1)))(
        ws_tp, x
    )
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-5, rtol=1e-5)


def test_pipelined_train_step_pp_tp_dp_matches_sequential(key, rng):
    """The FULL train step on the composed (data=2, model=2, stage=2) mesh:
    encoder pipelined over `stage`, Megatron col/row param shardings + SP
    activation constraints over `model` (active INSIDE the pipelined body
    via stage_tp_constraint / seq_shard_constraint(include_data=False)),
    batch sharded over `data` — loss, grad norm, and updated params match
    the sequential replicated step. This is the composability cell of
    docs/SCALING.md's mode table: every mode is placement over one mesh.
    Reference contrast: my_train_a.py:198 composes nothing (DDP only)."""
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import (
        set_activation_mesh,
        shard_batch,
        shard_params,
    )
    from cor_tpu.parallel.sharding import param_sharding_rules
    from cor_tpu.parallel.mesh import MODEL_AXIS
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step
    from tests.helpers import tiny_batch, tiny_core_config

    mesh = make_mesh(data=2, model=2, stage=2)
    cfg_seq = tiny_core_config(freeze_towers=False, encoder_override=PP_ENCODER)
    cfg_pp = tiny_core_config(
        freeze_towers=False,
        encoder_override=dataclasses.replace(
            PP_ENCODER, pp_stages=2, pp_microbatches=2, seq_shard=True
        ),
    )
    params = init_core_model(key, cfg_seq)
    # TP must actually engage: the rules find column AND row splits at m=2
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, param_sharding_rules(mesh, params)),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    assert any(len(s) == 2 and s[1] == MODEL_AXIS for s in specs)
    assert any(len(s) >= 1 and s[0] == MODEL_AXIS for s in specs)

    tx, _ = make_optimizer(params, optimizer="SGD", lr=1e-3, freeze_towers=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, batch=8).items()}
    batch["valid"] = jnp.ones((8,), jnp.float32)
    rng_key, lr = jax.random.PRNGKey(3), jnp.float32(1e-3)

    params_host = jax.tree.map(np.asarray, params)
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)

    seq_state, seq_m = make_train_step(cfg_seq, tx)(
        create_train_state(fresh(), tx), batch, rng_key, lr
    )

    set_activation_mesh(mesh)
    try:
        p_tp = shard_params(mesh, fresh())
        batch_tp = shard_batch(mesh, batch)
        pp_state, pp_m = make_train_step(cfg_pp, tx)(
            create_train_state(p_tp, tx), batch_tp, rng_key, lr
        )
    finally:
        set_activation_mesh(None)

    np.testing.assert_allclose(
        float(pp_m["total_loss"]), float(seq_m["total_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(pp_m["grad_norm"]), float(seq_m["grad_norm"]), rtol=1e-4
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(pp_state.params)[0],
        jax.tree_util.tree_flatten_with_path(seq_state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_pipelined_train_step_matches_sequential(key, rng):
    """The FULL train step (loss + backward + optimizer update) with the
    encoder pipelined over `stage` (TrainConfig.mesh_stage semantics:
    pp_stages baked into SamEncoderConfig) produces the same loss, gradient
    norm, and updated parameters as the sequential step — pipeline
    parallelism is trainable, not forward-only. freeze_towers=False so
    encoder gradients really flow through the scan/ppermute schedule."""
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import set_activation_mesh
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step
    from tests.helpers import tiny_batch, tiny_core_config

    mesh = make_mesh(data=4, model=1, stage=2)
    cfg_seq = tiny_core_config(
        freeze_towers=False, encoder_override=PP_ENCODER
    )
    cfg_pp = tiny_core_config(
        freeze_towers=False,
        encoder_override=dataclasses.replace(
            PP_ENCODER, pp_stages=2, pp_microbatches=2
        ),
    )
    params = init_core_model(key, cfg_seq)  # pp fields don't touch params
    # SGD: the update is LINEAR in the gradient, so post-update param parity
    # below IS gradient parity. (AdamW's first step is ~ lr*sign(g), which
    # amplifies float-reassociation noise on near-zero gradients into ~lr
    # param diffs — measured 2.3e-4 — without any real disparity.)
    tx, _ = make_optimizer(
        params, optimizer="SGD", lr=1e-3, freeze_towers=False
    )

    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, batch=8).items()}
    batch["valid"] = jnp.ones((8,), jnp.float32)
    rng_key = jax.random.PRNGKey(3)
    lr = jnp.float32(1e-3)

    # the jitted step donates its state: each run gets its own param copy
    # (host originals kept for the did-the-encoder-move check below)
    params_host = jax.tree.map(np.asarray, params)
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)

    seq_state, seq_metrics = make_train_step(cfg_seq, tx)(
        create_train_state(fresh(), tx), batch, rng_key, lr
    )

    set_activation_mesh(mesh)
    try:
        pp_state, pp_metrics = make_train_step(cfg_pp, tx)(
            create_train_state(fresh(), tx), batch, rng_key, lr
        )
    finally:
        set_activation_mesh(None)

    # same dropout keys on both sides (same rng, same step), so losses,
    # grad norms and updated params must agree to float tolerance
    np.testing.assert_allclose(
        float(pp_metrics["total_loss"]), float(seq_metrics["total_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(pp_metrics["grad_norm"]), float(seq_metrics["grad_norm"]),
        rtol=1e-4,
    )
    flat_s = jax.tree.leaves(seq_state.params)
    flat_p = jax.tree.leaves(pp_state.params)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )
    # and the encoder REALLY got gradients (not a silently-frozen tower)
    enc_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(
            jax.tree.leaves(pp_state.params["image_encoder"]),
            jax.tree.leaves(params_host["image_encoder"]),
        )
    )
    assert enc_delta > 0.0


def test_pipelined_step_composes_with_grad_accum(key, rng):
    """PP x gradient accumulation (SCALING.md's composability claim): the
    pipelined encoder inside the grad-accum lax.scan — a scan inside a scan
    over a shard_map — runs and matches the sequential grad-accum step's
    loss and updated params (SGD, dropout keys identical per microbatch)."""
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import set_activation_mesh
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step
    from tests.helpers import tiny_batch, tiny_core_config

    mesh = make_mesh(data=4, model=1, stage=2)
    cfg_seq = tiny_core_config(freeze_towers=False, encoder_override=PP_ENCODER)
    cfg_pp = tiny_core_config(
        freeze_towers=False,
        encoder_override=dataclasses.replace(
            PP_ENCODER, pp_stages=2, pp_microbatches=2
        ),
    )
    params = init_core_model(key, cfg_seq)
    params_host = jax.tree.map(np.asarray, params)
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)
    tx, _ = make_optimizer(params, optimizer="SGD", lr=1e-3, freeze_towers=False)

    # B=16: grad_accum=2 -> two microbatches of 8, each itself split into
    # pp_microbatches=2 gpipe microbatches of 4 sharded over data=4
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, batch=16).items()}
    batch["valid"] = jnp.ones((16,), jnp.float32)
    rng_key, lr = jax.random.PRNGKey(3), jnp.float32(1e-3)

    seq_state, seq_m = make_train_step(cfg_seq, tx, grad_accum=2)(
        create_train_state(fresh(), tx), batch, rng_key, lr
    )
    set_activation_mesh(mesh)
    try:
        pp_state, pp_m = make_train_step(cfg_pp, tx, grad_accum=2)(
            create_train_state(fresh(), tx), batch, rng_key, lr
        )
    finally:
        set_activation_mesh(None)

    np.testing.assert_allclose(
        float(pp_m["total_loss"]), float(seq_m["total_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(pp_state.params), jax.tree.leaves(seq_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_pipelined_step_composes_with_grad_accum_and_tp(key, rng):
    """The FULL composition: PP x TP x DP x gradient accumulation in one
    step on the (data=2, model=2, stage=2) mesh — the grad-accum lax.scan
    wrapping the pipelined encoder's scan-in-shard_map, with Megatron
    param shardings active over the auto `model` axis. Matches the
    sequential replicated grad-accum step on loss and every updated
    parameter (SGD; dropout keys identical per microbatch)."""
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import set_activation_mesh, shard_batch, shard_params
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step
    from tests.helpers import tiny_batch, tiny_core_config

    mesh = make_mesh(data=2, model=2, stage=2)
    cfg_seq = tiny_core_config(freeze_towers=False, encoder_override=PP_ENCODER)
    cfg_pp = tiny_core_config(
        freeze_towers=False,
        encoder_override=dataclasses.replace(
            PP_ENCODER, pp_stages=2, pp_microbatches=2, seq_shard=True
        ),
    )
    params = init_core_model(key, cfg_seq)
    params_host = jax.tree.map(np.asarray, params)
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)
    tx, _ = make_optimizer(params, optimizer="SGD", lr=1e-3, freeze_towers=False)

    # B=16: grad_accum=2 -> microbatches of 8, each pipelined in 2 gpipe
    # microbatches of 4, rows sharded over data=2
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, batch=16).items()}
    batch["valid"] = jnp.ones((16,), jnp.float32)
    rng_key, lr = jax.random.PRNGKey(3), jnp.float32(1e-3)

    seq_state, seq_m = make_train_step(cfg_seq, tx, grad_accum=2)(
        create_train_state(fresh(), tx), batch, rng_key, lr
    )
    set_activation_mesh(mesh)
    try:
        pp_state, pp_m = make_train_step(cfg_pp, tx, grad_accum=2)(
            create_train_state(shard_params(mesh, fresh()), tx),
            shard_batch(mesh, batch), rng_key, lr,
        )
    finally:
        set_activation_mesh(None)

    np.testing.assert_allclose(
        float(pp_m["total_loss"]), float(seq_m["total_loss"]), rtol=1e-5
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(pp_state.params)[0],
        jax.tree_util.tree_flatten_with_path(seq_state.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_trainer_mesh_stage_plumbing(key, rng, tmp_path):
    """TrainConfig.mesh_stage=2 drives the REAL Trainer end-to-end: the
    trainer builds the (data, model, stage) mesh, registers it for the
    pipelined encoder, pads batches to n_data * grad_accum * pp_microbatches,
    and one training epoch on a synthetic loader produces finite losses —
    the config-file path to pipeline parallelism, not just the raw step."""
    import logging

    from cor_tpu.config import TrainConfig
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import set_activation_mesh
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step
    from cor_tpu.train.trainer import Trainer
    from tests.helpers import tiny_batch, tiny_core_config

    tcfg = TrainConfig(
        epoch=1, lr=1e-3, batch_size=4, optimizer="SGD", lr_scheduler="None",
        mesh_data=4, mesh_model=1, mesh_stage=2, pp_microbatches=2,
        train_model_save_epoch=99, batch_record_interval=1,
        train_model_save_path=str(tmp_path), compute_dtype="float32",
        freeze_towers=False,
    )
    # flagship-sized cfg from core_config() is too big for CPU: substitute
    # the tiny PP-able encoder AFTER construction, the same pattern the
    # trajectory-parity test uses for its scaled-down composite
    core_cfg = tiny_core_config(
        freeze_towers=False,
        encoder_override=dataclasses.replace(
            PP_ENCODER, pp_stages=2, pp_microbatches=2
        ),
    )
    params = init_core_model(key, core_cfg)
    tx, schedule = make_optimizer(
        params, optimizer="SGD", lr=1e-3, freeze_towers=False
    )
    state = create_train_state(params, tx)
    try:
        trainer = Trainer(tcfg, state, tx, schedule, logging.getLogger("pp"))
        # the trainer built the 3-axis mesh and registered it at trace scope
        assert dict(trainer.mesh.shape) == {"data": 4, "model": 1, "stage": 2}
        from cor_tpu.parallel.sharding import get_activation_mesh

        assert get_activation_mesh() is trainer.mesh
        trainer.core_cfg = core_cfg
        trainer.train_step = make_train_step(core_cfg, tx)

        # batch padding multiple = n_data * grad_accum * pp_microbatches =
        # 4*1*2 = 8: a 3-row partial batch pads to 8 with a valid mask
        db = trainer._device_batch(
            {k: v[:3] for k, v in tiny_batch(rng, batch=4).items()}
        )
        assert db["query_img"].shape[0] == 8
        np.testing.assert_array_equal(db["valid"], [1, 1, 1, 0, 0, 0, 0, 0])

        class Loader:
            def __len__(self):
                return 2

            def __iter__(self):
                for s in range(2):
                    yield tiny_batch(np.random.default_rng(s), batch=4)

        loss = trainer.train_epoch(Loader(), epoch=1)
        assert np.isfinite(loss)
    finally:
        set_activation_mesh(None)


def test_gpipe_requires_stage_axis(key):
    mesh = make_mesh()  # (8, 1): no stage axis
    with pytest.raises(ValueError, match="stage"):
        gpipe(lambda w, x: x, jnp.zeros((2, 4)), jnp.zeros((4, 4)), mesh, 2)


def test_shard_stage_params_places_leading_axis(key):
    mesh = make_mesh(data=4, model=1, stage=2)
    p = init_sam_encoder(key, PP_ENCODER)
    pattern = [0 if i in PP_ENCODER.global_attn_indexes else PP_ENCODER.window_size for i in range(4)]
    stacked, _ = split_stages(p["blocks"], pattern, 2)
    placed = shard_stage_params(mesh, stacked)
    leaf = jax.tree.leaves(placed)[0]
    assert leaf.sharding.spec[0] == "stage"
