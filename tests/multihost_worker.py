"""Worker for the real 2-process multi-host test (test_multihost.py).

Run as: python tests/multihost_worker.py <process_id> <port> <out.json>

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh across 2 processes — the smallest honest model of a multi-host
TPU slice. The worker exercises the ACTUAL framework path:

  per-process loader shard (shard_id=process_index, DistributedSampler-style
  wrap padding) -> shard_batch (jax.make_array_from_process_local_data)
  -> jitted train step over the global mesh (grad psum over all 8 devices)

and records its local batch ids, the assembled GLOBAL id order, and the
global-batch loss so the parent can verify (a) hosts consumed disjoint
shards into one global batch and (b) the loss equals a single-process run
on the identical global batch (the reference's gather-weighted semantics,
utils/trainer_v3_g.py:102-103).
"""
import json
import sys

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from jax.sharding import NamedSharding, PartitionSpec as P

from cor_tpu.data.pipeline import DataLoader, SyntheticDataset
from cor_tpu.models.core_model import init_core_model
from cor_tpu.parallel import make_mesh, replicated, shard_batch
from cor_tpu.train.optim import make_optimizer
from cor_tpu.train.step import create_train_state, make_train_step
from tests.helpers import tiny_core_config

assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

mesh = make_mesh()  # 8 global devices, data axis
ds = SyntheticDataset(
    length=20, query_img_size=64, support_img_size=32, context_length=8,
    vocab_size=64, seed=11,
)
loader = DataLoader(
    ds, batch_size=8, shuffle=True, drop_last=True, seed=7,
    shard_id=jax.process_index(), num_shards=jax.process_count(),
)
batch = next(iter(loader))
local_ids = [int(i) for i in batch["pair_id"]]

keep = ("query_img", "query_mask", "support_img", "support_mask", "text", "pair_id")
dev = {k: jnp.asarray(batch[k]) for k in keep}
dev["valid"] = jnp.ones((8,), jnp.float32)
gbatch = shard_batch(mesh, dev)
assert gbatch["query_img"].shape[0] == 16  # global batch = 8 local x 2 hosts

# materialize the assembled global id order on every host
gids = jax.jit(lambda x: x, out_shardings=replicated(mesh))(gbatch["pair_id"])
global_ids = [int(i) for i in np.asarray(gids)]

core_cfg = tiny_core_config()
params = init_core_model(jax.random.PRNGKey(0), core_cfg)
tx, _ = make_optimizer(params, epochs=1)
state = jax.device_put(create_train_state(params, tx), replicated(mesh))
train_step = make_train_step(core_cfg, tx)
gbatch.pop("pair_id")
state, metrics = train_step(state, gbatch, jax.random.PRNGKey(1), jnp.float32(1e-3))
loss = float(metrics["total_loss"])

with open(out_path, "w") as f:
    json.dump({"pid": pid, "local_ids": local_ids, "global_ids": global_ids,
               "loss": loss}, f)
print(f"proc {pid}: loss={loss:.6f}")
