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
