"""Parameter and optimizer-state sharding rules.

The reference distributes only via Accelerate DDP/DeepSpeed over NCCL
(reference: my_train_a.py:69,198-222) — pure data parallelism plus optional
DeepSpeed optimizer-state sharding. The TPU-native equivalents here:

- ZeRO-1 analog (`shard_opt_state`): each optimizer-state leaf's first axis
  partitioned over the mesh's `data` axis when divisible (Adam moments
  dominate optimizer memory; frozen leaves already carry NO state thanks to
  optax.masked). XLA inserts the all-gathers where the update needs full
  leaves.
- Tensor parallelism (`param_sharding_rules`) — NEW capability the reference
  has no analog of, for the large towers (SigLIP SO400M / sam_huge):
  Megatron-style column/row pairs over the mesh's `model` axis. A column
  split (fc1 / fused-qkv: last axis) makes each chip compute its slice of
  heads / hidden units; the matching row split (fc2 / out-proj: first axis)
  contracts the sharded axis so GSPMD inserts ONE reduce (psum over ICI) per
  block instead of resharding activations. Everything is expressed as
  `NamedSharding` placement only — computation follows data under pjit, so
  correctness is placement-independent and the rules never change numerics
  (tests pin TP == replicated to float tolerance).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cor_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path-suffix, split) pairs for tensor parallelism. COL shards the LAST
# axis (and the matching bias); ROW shards the FIRST axis (bias replicated —
# it adds after the contraction's psum). Matches every transformer tower in
# the model family (SigLIP vision/text + MAP attn_pool, SAM ViT encoder,
# two-way decoder): see the param trees in models/siglip.py,
# models/sam_encoder.py, models/sam_decoder.py.
_COL_W = (
    "['mlp']['lin1']['w']",
    "['attn']['qkv']['w']",
    "['q_proj']['w']",
    "['k_proj']['w']",
    "['v_proj']['w']",
    "['attn_pool']['q']['w']",
    "['attn_pool']['kv']['w']",
)
_COL_B = tuple(s.replace("['w']", "['b']") for s in _COL_W)
_ROW_W = (
    "['mlp']['lin2']['w']",
    "['attn']['proj']['w']",
    "['out_proj']['w']",
    "['attn_pool']['proj']['w']",
)


# ---------------------------------------------------------------------------
# Sequence parallelism (Megatron-SP style, over the SAME `model` axis as
# tensor parallelism): activations between transformer blocks are sharded
# along the token axis, so LayerNorms / MLPs / elementwise work and the
# activation memory split across the model group; XLA inserts the
# all-gathers attention needs. Placement-only — numerics are unchanged.
#
# The mesh is registered explicitly (set_activation_mesh) rather than read
# from an ambient context: constraints are baked at trace time, so the mesh
# must be set BEFORE the first jitted step and never changed under a live
# jit cache (the Trainer and the dryrun do this).
# ---------------------------------------------------------------------------

_ACTIVATION_MESH: Mesh | None = None


def set_activation_mesh(mesh: Mesh | None) -> None:
    """Register (or clear, with None) the mesh that seq_shard_constraint
    constrains against. Call before the first traced forward."""
    global _ACTIVATION_MESH
    _ACTIVATION_MESH = mesh


def get_activation_mesh() -> Mesh | None:
    """The mesh registered by set_activation_mesh (None if unset). Consumed
    by seq_shard_constraint and by the pipelined SAM encoder
    (SamEncoderConfig.pp_stages > 1), both of which bake mesh context at
    trace time."""
    return _ACTIVATION_MESH


def seq_shard_constraint(x, seq_axis: int = 1, include_data: bool = True):
    """Constrain x's token axis over the mesh's `model` axis (and its batch
    axis over `data` when divisible). No-op when no activation mesh is
    registered, the model axis is trivial, or the axis doesn't divide.

    ``include_data=False`` is for call sites INSIDE a partial-manual
    shard_map whose manual axes include `data` (the gpipe body): there the
    batch axis is already per-device and only the auto `model` axis may be
    mentioned in a GSPMD constraint."""
    mesh = _ACTIVATION_MESH
    if mesh is None:
        return x
    m = dict(mesh.shape).get(MODEL_AXIS, 1)
    if m <= 1 or x.shape[seq_axis] % m != 0:
        return x
    spec = [None] * x.ndim
    spec[seq_axis] = MODEL_AXIS
    d = dict(mesh.shape).get(DATA_AXIS, 1)
    if include_data and seq_axis != 0 and d >= 1 and x.shape[0] % d == 0:
        spec[0] = DATA_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def param_sharding_rules(mesh: Mesh, params):
    """Pytree of NamedShardings implementing tensor parallelism over the
    mesh's `model` axis (Megatron column/row pairs); replicated where the
    pattern doesn't match or the axis doesn't divide.

    With mesh model=1 every spec degenerates to replicated — the parity
    mode. Use together with `shard_batch` (data axis) for 2-D dp x tp.
    """
    m = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        s = jax.tree_util.keystr(path)
        shape = np.shape(leaf)
        if m > 1 and shape:
            if s.endswith(_COL_W) and len(shape) == 2 and shape[1] % m == 0:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if s.endswith(_COL_B) and len(shape) == 1 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS))
            if s.endswith(_ROW_W) and len(shape) == 2 and shape[0] % m == 0:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def stage_stacked_tp_specs(mesh: Mesh, stage_tree):
    """PartitionSpecs for a STAGE-STACKED block-param tree (leaves carry a
    leading [S] axis, cor_tpu.parallel.pipeline.split_stages): the same
    Megatron column/row rules as `param_sharding_rules`, shifted one axis
    right, composed with `stage` on axis 0.

    This is the PP x TP composition point: the stacked weights feed gpipe's
    partial-manual shard_map (manual over stage/data, auto over model), so
    the stage axis is consumed by the manual in_spec while the model-axis
    sharding rides through to GSPMD, which partitions each stage's GEMMs
    across its model group exactly as in the unpipelined TP path."""
    from jax.sharding import PartitionSpec  # noqa: F401  (doc anchor)

    m = dict(mesh.shape).get(MODEL_AXIS, 1)
    from cor_tpu.parallel.mesh import STAGE_AXIS

    def spec(path, leaf):
        s = jax.tree_util.keystr(path)
        shape = np.shape(leaf)
        if m > 1 and len(shape) >= 2:
            if s.endswith(_COL_W) and len(shape) == 3 and shape[2] % m == 0:
                return P(STAGE_AXIS, None, MODEL_AXIS)
            if s.endswith(_COL_B) and len(shape) == 2 and shape[1] % m == 0:
                return P(STAGE_AXIS, MODEL_AXIS)
            if s.endswith(_ROW_W) and len(shape) == 3 and shape[1] % m == 0:
                return P(STAGE_AXIS, MODEL_AXIS, None)
        return P(STAGE_AXIS)

    return jax.tree_util.tree_map_with_path(spec, stage_tree)


def stage_tp_constraint(mesh: Mesh, stage_tree):
    """with_sharding_constraint a stage-stacked tree per
    `stage_stacked_tp_specs` (trace-time placement for the jitted train
    path, where the stack is built inside the traced function and a
    device_put is unavailable)."""
    specs = stage_stacked_tp_specs(mesh, stage_tree)
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s)),
        stage_tree,
        specs,
    )


def shard_params(mesh: Mesh, params):
    """Place params across the mesh per `param_sharding_rules`."""
    return jax.tree.map(jax.device_put, params, param_sharding_rules(mesh, params))


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
