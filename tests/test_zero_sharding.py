"""ZeRO-1-style optimizer-state sharding: sharded and replicated states give
identical training trajectories on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import init_core_model
from cor_tpu.parallel import make_mesh, replicated, shard_batch, shard_opt_state
from cor_tpu.parallel.mesh import DATA_AXIS
from cor_tpu.train.optim import make_optimizer
from cor_tpu.train.step import TrainState, create_train_state, make_train_step
from tests.helpers import tiny_batch, tiny_core_config


def test_sharded_opt_state_matches_replicated(key, rng):
    cfg = tiny_core_config()
    mesh = make_mesh()
    params = init_core_model(key, cfg)
    tx, _ = make_optimizer(params, lr=1e-3, epochs=5)
    batch = shard_batch(
        mesh, {k: jnp.asarray(v) for k, v in tiny_batch(rng, batch=16).items()}
    )
    train_step = make_train_step(cfg, tx)

    # replicated run
    s_rep = jax.device_put(create_train_state(params, tx), replicated(mesh))
    s_rep, m_rep = train_step(s_rep, batch, jax.random.PRNGKey(0), jnp.float32(1e-3))

    # sharded run
    params2 = init_core_model(key, cfg)
    s_sh = jax.device_put(create_train_state(params2, tx), replicated(mesh))
    sharded_opt = shard_opt_state(mesh, s_sh.opt_state)
    # at least one big leaf actually sharded over the data axis
    specs = [
        l.sharding.spec for l in jax.tree.leaves(sharded_opt)
        if hasattr(l, "sharding") and np.ndim(l) >= 1
    ]
    assert any(len(s) and s[0] == DATA_AXIS for s in specs)
    s_sh = TrainState(s_sh.params, sharded_opt, s_sh.step)
    batch2 = shard_batch(
        mesh,
        {k: jnp.asarray(v) for k, v in tiny_batch(np.random.default_rng(0), batch=16).items()},
    )
    s_sh, m_sh = train_step(s_sh, batch2, jax.random.PRNGKey(0), jnp.float32(1e-3))

    np.testing.assert_allclose(
        float(m_rep["total_loss"]), float(m_sh["total_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s_rep.params["mask_decoder"]),
        jax.tree.leaves(s_sh.params["mask_decoder"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
