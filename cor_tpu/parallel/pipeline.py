"""GPipe-style pipeline parallelism over a `stage` mesh axis.

The reference has no pipeline parallelism (its only distribution is
Accelerate DDP/DeepSpeed, my_train_a.py:69,198-222); this is a cor_tpu
scaling addition for models whose weights/activations outgrow one chip
(sam_huge fine-tunes at large batch / high resolution). TPU-native design:

- the schedule is a ``lax.scan`` over M + S - 1 ticks inside ONE
  ``shard_map`` over the mesh's ``stage`` axis — each tick every stage
  runs its block-chunk on its in-flight microbatch and hands the result to
  its successor with a single ``ppermute`` (a nearest-neighbor ICI hop;
  `make_mesh` places `stage` innermost);
- stage weights are a stacked pytree with a leading [S] axis sharded
  ``P('stage')`` — each device holds exactly its stage's blocks;
- microbatches stay sharded over ``data`` throughout, so pipeline and data
  parallelism compose inside the same shard_map.

The SAM encoder's block stack is stage-homogeneous by construction: every
SAM size (base/large/huge) interleaves windowed and global-attention blocks
in a pattern that repeats every depth/4 blocks (image_encoder.py:17-119's
``global_attn_indexes``), so 2 or 4 stages hold identical param structures
— the requirement for SPMD weight stacking.

Like all cor_tpu parallelism this is placement + schedule only: numerics
are unchanged (tests pin pipelined == sequential to float tolerance).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cor_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, STAGE_AXIS


def split_stages(blocks: List, window_pattern: Sequence[int], n_stages: int):
    """Stack a homogeneous block list into a per-stage pytree.

    blocks: list of per-block param trees (len == depth); window_pattern:
    per-block window size (0 = global). Returns (stacked, stage_pattern)
    where ``stacked`` is a list of `depth // n_stages` pytrees whose leaves
    carry a leading [n_stages] axis (shard with P('stage')), and
    ``stage_pattern`` is the (identical) within-stage window pattern.
    """
    depth = len(blocks)
    assert depth % n_stages == 0, f"depth {depth} % stages {n_stages} != 0"
    per = depth // n_stages
    pats = [tuple(window_pattern[s * per : (s + 1) * per]) for s in range(n_stages)]
    assert all(p == pats[0] for p in pats), (
        f"stages are not homogeneous: {pats} — pick n_stages so the "
        "windowed/global pattern repeats per stage (2 or 4 for all SAM sizes)"
    )
    stacked = [
        jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[blocks[s * per + j] for s in range(n_stages)],
        )
        for j in range(per)
    ]
    return stacked, pats[0]


def shard_stage_params(mesh: Mesh, stacked):
    """Place stacked per-stage params: leading axis over `stage`."""
    s = NamedSharding(mesh, P(STAGE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), stacked)


def gpipe(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
) -> jax.Array:
    """Run ``n_stages`` sequential applications of ``stage_fn`` as a GPipe
    pipeline over the mesh's `stage` axis.

    stage_fn(params_one_stage, x_microbatch) -> y_microbatch, shape-
    preserving. stage_params: pytree with leading [S] axis (S == mesh
    stage extent). x: [B, ...] with B % n_microbatches == 0.

    Schedule: M + S - 1 ticks; at tick t stage s computes microbatch
    t - s (garbage flows through the bubble and is never recorded). One
    ppermute per tick hands activations to the successor; the filled output
    is broadcast off the last stage with a masked psum.
    """
    if STAGE_AXIS not in mesh.shape:
        raise ValueError("gpipe needs a mesh with a 'stage' axis (make_mesh(stage=S))")
    S = mesh.shape[STAGE_AXIS]
    B = x.shape[0]
    M = n_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    xm = x.reshape(M, B // M, *x.shape[1:])

    def per_shard(params, xm_local):
        # local stage extent is 1: strip the stacked axis
        p_local = jax.tree.map(lambda t: t[0], params)
        sid = jax.lax.axis_index(STAGE_AXIS)
        T = M + S - 1

        def tick(carry, t):
            buf, out = carry
            inp = jnp.where(sid == 0, xm_local[jnp.minimum(t, M - 1)], buf)
            y = stage_fn(p_local, inp)
            y_next = jax.lax.ppermute(
                y, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            oidx = t - (S - 1)
            write = (sid == S - 1) & (oidx >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(oidx, 0, M - 1), 0
            )
            out = jnp.where(write, upd, out)
            return (y_next, out), None

        buf0 = jnp.zeros_like(xm_local[0])
        out0 = jnp.zeros_like(xm_local)
        (_, out), _ = jax.lax.scan(tick, (buf0, out0), jnp.arange(T))
        # only the last stage holds real outputs: broadcast over the stage
        # axis so the (stage-unmentioned) out_spec is truly replicated
        out = jax.lax.psum(jnp.where(sid == S - 1, out, 0.0), STAGE_AXIS)
        return out

    # Partial-manual shard_map when the mesh carries a real tensor-parallel
    # group: manual over stage (the ppermute schedule) and data (per-device
    # microbatch rows), while `model` stays a GSPMD auto axis — so
    # tensor-parallel weight shardings and activation constraints keep
    # working INSIDE the pipelined stage body. This is how PP x TP x DP
    # compose over one mesh. With model == 1 the mapping stays fully manual
    # (identical to the pure-PP path, and eager-callable — partial-manual
    # shard_map can only infer the auto-axis output sharding under jit).
    auto = (
        frozenset({MODEL_AXIS})
        if dict(mesh.shape).get(MODEL_AXIS, 1) > 1
        else frozenset()
    )
    manual = frozenset(mesh.axis_names) - auto
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        mapped = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(STAGE_AXIS), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
            axis_names=manual,
            check_vma=False,
        )
    else:
        from jax.experimental.shard_map import shard_map

        mapped = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(STAGE_AXIS), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
            check_rep=False,
            auto=frozenset(mesh.axis_names) - manual,
        )
    out = mapped(stage_params, xm)
    return out.reshape(B, *x.shape[1:])


def pipelined_sam_encoder(
    p,
    x: jax.Array,
    cfg,
    mesh: Mesh,
    n_microbatches: int,
    n_stages: int | None = None,
):
    """SAM encoder forward with the block stack pipelined over `stage`.

    Numerically identical to ``sam_encoder`` (same blocks, same order);
    patch-embed / pos-add / neck run outside the pipeline, data-sharded.
    Stage weights may be pre-placed with ``shard_stage_params``.
    """
    from cor_tpu.models.sam_encoder import _block, _ln, _patch_embed
    from cor_tpu.ops.common import conv2d

    S = n_stages or mesh.shape[STAGE_AXIS]
    depth = len(p["blocks"])
    pattern = [
        0 if i in cfg.global_attn_indexes else cfg.window_size for i in range(depth)
    ]
    stacked, stage_pattern = split_stages(p["blocks"], pattern, S)
    # tree with list-of-blocks structure — shard_map broadcasts the single
    # P('stage') spec over every leaf
    stage_tree = {f"b{j}": t for j, t in enumerate(stacked)}

    tp = dict(mesh.shape).get(MODEL_AXIS, 1) > 1
    if tp:
        # PP x TP: constrain the stacked weights with the Megatron col/row
        # specs shifted past the stage axis — gpipe's shard_map is manual
        # only over stage/data, so GSPMD partitions each stage's GEMMs over
        # its `model` group exactly as in the unpipelined TP path
        from cor_tpu.parallel.sharding import stage_tp_constraint

        stage_tree = stage_tp_constraint(mesh, stage_tree)

    x = _patch_embed(p["patch_embed"], x, cfg.patch_size)
    if cfg.use_abs_pos:
        x = x + p["pos_embed"].astype(x.dtype)

    def stage_fn(params, xx):
        from cor_tpu.parallel.sharding import seq_shard_constraint

        for j, win in enumerate(stage_pattern):
            xx = _block(params[f"b{j}"], xx, cfg, win)
            if tp and cfg.seq_shard:
                # Megatron-SP inside the pipeline body: token axis over the
                # auto `model` axis only (data/stage are manual here)
                xx = seq_shard_constraint(xx, include_data=False)
        return xx

    x = gpipe(stage_fn, stage_tree, x, mesh, n_microbatches)
    if tp:
        # gather the token axis back off `model` before the neck: leaving the
        # pipeline output H-sharded sends the 3x3 neck conv down GSPMD's
        # spatial-halo path, whose weight-grad transpose double-counts the
        # halo rows when the producer is a check_vma=False shard_map output
        # (measured: neck.conv2.w grad exactly model-times too large). The
        # gather is one all-gather of the [B, 64, 64, 256] map — noise next
        # to the block stack it follows.
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(DATA_AXIS))
        )

    n = p["neck"]
    x = conv2d(n["conv1"], x)
    x = _ln(n["ln1"], x, cfg, 1e-6)
    x = conv2d(n["conv2"], x, padding=1)
    x = _ln(n["ln2"], x, cfg, 1e-6)
    return x
