"""Retrieval engine tests: sharded scan == dense scan, recall math, and the
full encode -> retrieve -> decode pipeline on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import init_core_model
from cor_tpu.parallel import make_mesh
from cor_tpu.retrieval.engine import (
    RetrievalEngine,
    recall_at_k,
    top_k_retrieve,
)
from cor_tpu.retrieval.index import (
    make_candidate_encoder,
    make_candidate_mask_decoder,
    make_query_encoder,
)
from tests.helpers import tiny_batch, tiny_core_config


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_sharded_retrieve_matches_dense(rng):
    mesh = make_mesh()
    G, Q, D, k = 103, 7, 32, 9  # G deliberately not divisible by 8
    gallery = _normed(rng, G, D)
    queries = _normed(rng, Q, D)

    engine = RetrievalEngine(mesh, k=k)
    engine.set_gallery(gallery)
    s_scores, s_idx = engine.retrieve(jnp.asarray(queries))

    d_scores, d_idx = top_k_retrieve(jnp.asarray(queries), jnp.asarray(gallery), k)

    np.testing.assert_allclose(
        np.asarray(s_scores), np.asarray(d_scores), atol=1e-5, rtol=1e-5
    )
    # indices may differ only under exact score ties; random floats make ties
    # measure-zero
    np.testing.assert_array_equal(np.asarray(s_idx), np.asarray(d_idx))


def test_retrieve_self_similarity(rng):
    """Each gallery row queried by itself must return itself at rank 1."""
    mesh = make_mesh()
    gallery = _normed(rng, 64, 16)
    engine = RetrievalEngine(mesh, k=5)
    engine.set_gallery(gallery)
    _, idx = engine.retrieve(jnp.asarray(gallery[:16]))
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(16))


def test_recall_at_k():
    retrieved = np.array([[3, 1, 2], [0, 5, 4], [9, 8, 7]])
    targets = np.array([3, 4, 6])
    r = recall_at_k(retrieved, targets, ks=(1, 3))
    assert r["recall@1"] == 1 / 3
    assert abs(r["recall@3"] - 2 / 3) < 1e-9


def test_full_retrieval_pipeline(key, rng):
    """Candidate encode -> sharded top-k -> per-candidate mask decode."""
    cfg = tiny_core_config()
    params = init_core_model(key, cfg)
    mesh = make_mesh()

    # gallery: 12 candidate (image, mask) pairs at query resolution
    cand_imgs = rng.standard_normal((12, 64, 64, 3)).astype(np.float32)
    cand_masks = (rng.random((12, 64, 64, 1)) > 0.5).astype(np.float32)
    encode_cand = make_candidate_encoder(cfg)
    cand_emb, cand_img_emb = encode_cand(
        params, jnp.asarray(cand_imgs), jnp.asarray(cand_masks)
    )
    assert cand_emb.shape == (12, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cand_emb), axis=1), 1.0, atol=1e-5
    )

    # queries from the support branch
    b = tiny_batch(rng, batch=3)
    encode_q = make_query_encoder(cfg)
    q = encode_q(
        params,
        jnp.asarray(b["support_img"]),
        jnp.asarray(b["text"]),
        jnp.asarray(b["support_mask"]),
    )
    assert q.shape == (3, 16)

    engine = RetrievalEngine(mesh, k=4)
    engine.set_gallery(np.asarray(cand_emb))
    scores, idx = engine.retrieve(q)
    assert idx.shape == (3, 4)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 12).all()
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-6).all()  # sorted

    # decode masks for the top-1 candidates
    top1 = np.asarray(idx)[:, 0]
    decode = make_candidate_mask_decoder(cfg)
    masks = decode(params, jnp.asarray(np.asarray(cand_img_emb)[top1]), q)
    assert masks.shape == (3, 1, 16, 16)
    assert np.isfinite(np.asarray(masks)).all()
