"""Device mesh + sharding rules.

The reference distributes purely with HF Accelerate DDP/DeepSpeed over NCCL
(reference: my_train_a.py:69,198; utils/trainer_v3_g.py:76-103). The TPU-native
equivalent is a ``jax.sharding.Mesh`` whose axes are picked so collectives
ride ICI:

- ``data``  — batch (and gallery) axis; gradient psum == DDP all-reduce.
- ``model`` — optional tensor axis for sharding large weights / ZeRO-style
  optimizer-state partitioning.

Everything downstream uses named shardings; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
    stage: int = 1,
) -> Mesh:
    """Build a (data, model[, stage]) mesh over the available devices.

    With `model=1` this degenerates to pure data parallelism, the parity mode
    with the reference's DDP. `stage > 1` adds a pipeline-parallel axis
    (cor_tpu.parallel.pipeline). jax.make_mesh picks an ICI-friendly device
    ordering for the requested axis shape; `stage` is innermost so the
    per-tick ppermute handoffs ride nearest-neighbor ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * stage)
    assert data * model * stage == n, f"mesh {data}x{model}x{stage} != {n} devices"
    if stage == 1:
        dev_array = np.asarray(devices).reshape(data, model)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    dev_array = np.asarray(devices).reshape(data, model, stage)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, STAGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded along axis 0.

    Single-process: a plain device_put against the (global == local) mesh.
    Multi-host: each process's batch is its DISJOINT shard of the global
    batch (the train loader shards indices by ``jax.process_index()``), so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the global batch axis is
    local_rows x process_count. A bare device_put of per-host data against a
    global-mesh sharding would instead treat every host's rows as the same
    global batch (or fail placement).
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def pad_batch(batch, multiple: int, target: Optional[int] = None):
    """Pad every leaf's leading axis so it divides the mesh (reference val
    loaders are drop_last=False — utils/dataloader.py:372-412 — so the final
    partial batch must still shard).

    Padding replicates the last sample (keeps values in-distribution); the
    returned batch carries a ``valid`` [B_padded] float mask (1 = real row,
    0 = padding) that the loss / eval reductions weight by, so metrics and
    gradients are unaffected. Pass ``target`` (e.g. the full batch size,
    rounded up) to keep ONE compiled shape across full and remainder batches.
    """
    import jax.numpy as jnp

    n = jax.tree.leaves(batch)[0].shape[0]
    size = max(n, target or 0)
    size = -(-size // multiple) * multiple
    pad = size - n
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    if pad == 0:
        return {**batch, "valid": valid}
    padded = jax.tree.map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0),
        batch,
    )
    return {**padded, "valid": valid}
