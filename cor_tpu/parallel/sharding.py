"""Optimizer-state sharding (ZeRO-1 analog).

The reference optionally shards optimizer state via DeepSpeed
(reference: my_train_a.py:208-213, trainer_v3_g.py:128-131). The TPU-native
equivalent: place each optimizer-state leaf with its first axis partitioned
over the mesh's `data` axis when divisible (Adam moments dominate optimizer
memory; frozen leaves already carry NO state thanks to optax.masked).
XLA inserts the all-gathers where the update needs full leaves.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cor_tpu.parallel.mesh import DATA_AXIS


def opt_state_sharding_tree(mesh: Mesh, opt_state):
    """Pytree of NamedShardings: leaf first-axis sharded over `data` when
    divisible, replicated otherwise."""
    n = mesh.shape[DATA_AXIS]

    def spec(leaf):
        shape = np.shape(leaf)
        if len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, opt_state)


def shard_opt_state(mesh: Mesh, opt_state):
    """Place the optimizer state across the mesh (ZeRO-1-style)."""
    shardings = opt_state_sharding_tree(mesh, opt_state)
    return jax.tree.map(jax.device_put, opt_state, shardings)
