"""Tensor-parallel param placement (Megatron column/row rules over the
`model` mesh axis): a dp x tp (4, 2) mesh gives the same loss and the same
GRADIENTS as the pure-DP replicated placement — sharding is placement-only
under pjit, never semantics (new capability; the reference is DDP-only,
my_train_a.py:69,198-222). Gradients, not post-AdamW params, are compared:
AdamW's first step is ~±lr for any element whose gradient is at
reassociation-noise scale, so per-element param bounds are structurally
unsound (same reasoning as the trajectory-parity test tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import core_forward, init_core_model
from cor_tpu.parallel import (
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_params,
)
from cor_tpu.parallel.mesh import MODEL_AXIS
from cor_tpu.train.losses import core_total_loss
from tests.helpers import tiny_batch, tiny_core_config


def _loss_and_grads(cfg, mesh, params, place_params, rng_seed=0):
    batch = shard_batch(
        mesh,
        {
            k: jnp.asarray(v)
            for k, v in tiny_batch(np.random.default_rng(rng_seed), batch=16).items()
        },
    )
    p = place_params(params)

    def loss_fn(p):
        pred, qemb, sfeat = core_forward(
            p,
            batch["query_img"],
            batch["support_img"],
            batch["text"],
            batch["support_mask"],
            cfg,
            key=jax.random.PRNGKey(1),
            train=True,
        )
        total, _ = core_total_loss(
            jnp.transpose(pred, (0, 2, 3, 1)), batch["query_mask"], qemb, sfeat
        )
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p)
    return float(loss), jax.tree.map(np.asarray, grads)


def test_tensor_parallel_matches_replicated(key):
    cfg = tiny_core_config()
    mesh_dp = make_mesh()  # (8, 1): pure DP
    mesh_tp = make_mesh(model=2)  # (4, 2): dp x tp
    params = init_core_model(key, cfg)

    # the rules must actually engage: column AND row splits present
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, param_sharding_rules(mesh_tp, params)),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    assert any(len(s) == 2 and s[1] == MODEL_AXIS for s in specs), "no column split"
    assert any(len(s) >= 1 and s[0] == MODEL_AXIS for s in specs), "no row split"

    loss_rep, g_rep = _loss_and_grads(
        cfg, mesh_dp, params, lambda p: jax.device_put(p, replicated(mesh_dp))
    )
    loss_tp, g_tp = _loss_and_grads(
        cfg, mesh_tp, params, lambda p: shard_params(mesh_tp, p)
    )

    np.testing.assert_allclose(loss_rep, loss_tp, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_rep)[0],
        jax.tree_util.tree_flatten_with_path(g_tp)[0],
    ):
        np.testing.assert_allclose(
            a, b, atol=1e-5, rtol=1e-4, err_msg=jax.tree_util.keystr(kp)
        )


def test_sequence_parallel_matches_replicated(key):
    """seq_shard=True (Megatron-SP token-axis activation constraints over the
    model axis, on top of tensor-parallel params): same loss and gradients as
    the replicated pure-DP placement — placement-only, never semantics."""
    import dataclasses

    from cor_tpu.parallel import set_activation_mesh
    from tests.helpers import TINY_ENCODER

    cfg_sp = tiny_core_config(
        encoder_override=dataclasses.replace(TINY_ENCODER, seq_shard=True)
    )
    cfg = tiny_core_config()
    mesh_dp = make_mesh()
    mesh_tp = make_mesh(model=2)
    params = init_core_model(key, cfg)

    loss_rep, g_rep = _loss_and_grads(
        cfg, mesh_dp, params, lambda p: jax.device_put(p, replicated(mesh_dp))
    )
    set_activation_mesh(mesh_tp)
    try:
        # the constraint must actually engage: jit a bare constraint call and
        # check the output really lands token-sharded on the model axis
        from cor_tpu.parallel import seq_shard_constraint

        probe = jax.jit(seq_shard_constraint)(jnp.ones((8, 4, 4, 16)))
        spec = probe.sharding.spec
        assert len(spec) >= 2 and spec[1] == MODEL_AXIS, f"constraint inert: {spec}"

        loss_sp, g_sp = _loss_and_grads(
            cfg_sp, mesh_tp, params, lambda p: shard_params(mesh_tp, p)
        )
    finally:
        set_activation_mesh(None)

    np.testing.assert_allclose(loss_rep, loss_sp, rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_rep)[0],
        jax.tree_util.tree_flatten_with_path(g_sp)[0],
    ):
        np.testing.assert_allclose(
            a, b, atol=1e-5, rtol=1e-4, err_msg=jax.tree_util.keystr(kp)
        )


def test_param_sharding_rules_degenerate_on_model1(key):
    """With model=1 every spec is replicated (the DDP-parity mode)."""
    cfg = tiny_core_config()
    mesh = make_mesh()  # model=1
    params = init_core_model(key, cfg)
    tree = param_sharding_rules(mesh, params)
    for s in jax.tree.leaves(
        jax.tree.map(lambda x: x.spec, tree),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    ):
        assert s == jax.sharding.PartitionSpec()
