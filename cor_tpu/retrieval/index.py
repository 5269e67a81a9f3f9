"""Gallery index construction: encode candidate objects into the retrieval
embedding space.

The retrieval space reuses CORE's contrastive geometry: a gallery candidate
(image, object mask) is embedded by mask-pooling the SAM query-image
embedding over the candidate's mask and L2-normalizing — exactly the feature
the fg/bg region-contrastive losses align with the support feature during
training (reference: utils/loss_func.py:35-85). A query (support image +
support mask + change text) is embedded by the support branch. Retrieval =
cosine top-k between the two.

The full pipeline for a query additionally decodes a segmentation mask for
each retrieved candidate with the SAM mask decoder, reusing the candidate's
precomputed image embedding (one decoder pass per (query, candidate) pair —
the decoder is tiny next to the encoders).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import CoreConfig, _cast
from cor_tpu.models.prompt_encoder import get_dense_pe, prompt_encoder_dense
from cor_tpu.models.sam_decoder import mask_decoder
from cor_tpu.models.sam_encoder import sam_encoder
from cor_tpu.models.support_branch import support_branch
from cor_tpu.train.losses import mask_pool_normalized


def make_candidate_encoder(cfg: CoreConfig):
    """Returns encode(params, images [B,S,S,3], masks [B,S,S,1]) ->
    (embeddings [B, D], image_embeddings [B, g, g, C])."""

    @jax.jit
    def encode(params, images, masks):
        p = _cast(params, cfg.dtype)
        emb = sam_encoder(p["image_encoder"], images.astype(cfg.dtype), cfg.encoder)
        pooled = mask_pool_normalized(emb, masks)  # fp32 [B, C]
        return pooled, emb.astype(jnp.float32)

    return encode


def make_query_encoder(cfg: CoreConfig):
    """Returns encode(params, support_img, text, support_mask) -> [B, D]
    L2-normed query embedding in the retrieval space (the support feature)."""

    @jax.jit
    def encode(params, support_img, text, support_mask):
        p = _cast(params, cfg.dtype)
        feat = support_branch(
            p["support_branch"],
            support_img.astype(cfg.dtype),
            text,
            support_mask.astype(cfg.dtype),
            cfg.support,
            train=False,
        )
        return feat[:, 0, :].astype(jnp.float32)  # [B, D]

    return encode


def make_candidate_mask_decoder(cfg: CoreConfig):
    """Returns decode(params, cand_image_embeddings [B,g,g,C],
    query_feats [B, D]) -> mask logits [B, 1, 4g, 4g]: segment the retrieved
    candidate object conditioned on the composed query prompt."""

    @jax.jit
    def decode(params, cand_embeddings, query_feats):
        p = _cast(params, cfg.dtype)
        B = cand_embeddings.shape[0]
        dense_e = prompt_encoder_dense(p["prompt_encoder"], B, cfg.prompt).astype(cfg.dtype)
        image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cfg.dtype)
        masks, iou, _ = mask_decoder(
            p["mask_decoder"],
            cand_embeddings.astype(cfg.dtype),
            image_pe,
            query_feats[:, None, :].astype(cfg.dtype),
            dense_e,
            cfg.decoder,
            multimask_output=cfg.multimask_output,
            fused=True,
        )
        if cfg.multimask_output:
            best = jnp.argmax(iou, axis=1)
            masks = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)
        return masks.astype(jnp.float32)

    return decode


def make_store_indexed_mask_decoder(cfg: CoreConfig):
    """Store-indexed decode against an HBM-RESIDENT int8 candidate store:
    decode(params, store_q int8 [S,g,g,C], scales fp32 [S], idx int32 [B],
    query_feats [B, D]) -> mask logits [B, 1, 4g, 4g].

    The first fused two-way layer reads store_q[idx[b]] directly via
    scalar-prefetch block indexing and dequantizes each tile in VMEM
    (ops/pallas/two_way_layer.py) — no host round trip, no batched gather,
    4x less store HBM than fp32. The store must carry the dense no-mask
    prompt pre-baked (quantize_candidate_store[_host] with no_mask_embed)."""

    @jax.jit
    def decode(params, store_q, scales, idx, query_feats):
        p = _cast(params, cfg.dtype)
        image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cfg.dtype)
        masks, iou, _ = mask_decoder(
            p["mask_decoder"],
            store_q,
            image_pe,
            query_feats[:, None, :].astype(cfg.dtype),
            None,  # dense prompt pre-baked into the quantized store
            cfg.decoder,
            multimask_output=cfg.multimask_output,
            fused=True,
            store_idx=idx,
            store_scale=scales,
        )
        if cfg.multimask_output:
            best = jnp.argmax(iou, axis=1)
            masks = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)
        return masks.astype(jnp.float32)

    return decode


def build_gallery(
    cfg: CoreConfig,
    params,
    batches: Iterable[Dict[str, np.ndarray]],
    with_store: bool = False,
    store_dtype=np.float16,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """One pass over a triplet loader -> (embeddings [G, D], pair_ids [G],
    store [G, g, g, C] or None) — THE gallery-encoding loop (the index CLI's
    build_index is an alias). ``store_dtype`` defaults to fp16: it halves
    the artifact's disk/IO and the decode path computes in bf16 anyway."""
    encode = make_candidate_encoder(cfg)
    embs, ids, stores = [], [], []
    for b in batches:
        e, ie = encode(
            params, jnp.asarray(b["query_img"]), jnp.asarray(b["query_mask"])
        )
        embs.append(np.asarray(e))
        ids.append(np.asarray(b["pair_id"]))
        if with_store:
            stores.append(np.asarray(ie, store_dtype))
    return (
        np.concatenate(embs, axis=0),
        np.concatenate(ids, axis=0),
        np.concatenate(stores, axis=0) if with_store else None,
    )


# ---------------------------------------------------------------------------
# Persistent gallery-index artifact (serving: build once, retrieve many).
# The reference has no retrieval engine at all (SURVEY.md §0 — Recall@K is an
# offline script over dumped masks); this is the deployment-side half of the
# north-star capability: `cor_tpu.cli.index` encodes a manifest's candidates
# ONCE into an on-disk artifact, and `cor_tpu.cli.retrieve --gallery-index`
# serves queries against it without re-encoding the gallery.
# ---------------------------------------------------------------------------

_INDEX_VERSION = 1


def save_gallery_index(
    path,
    embeddings: np.ndarray,  # [G, D] fp32, L2-normed rows
    pair_ids: np.ndarray,  # [G] manifest pair ids
    image_embeddings: Optional[np.ndarray] = None,  # [G, g, g, C] for decode
) -> None:
    """Write a directory artifact: embeddings.npy + pair_ids.npy
    (+ store.npy fp16 when the SAM image embeddings are kept for mask
    decode — fp16 halves disk/IO; the decode path computes in bf16 anyway)
    + meta.json. Plain .npy files so the store loads memory-mapped: a
    COR127K-scale store is ~2 GB per 1k candidates and must not be read
    eagerly."""
    import json as _json
    from pathlib import Path as _Path

    d = _Path(path)
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / "embeddings.npy", np.ascontiguousarray(embeddings, np.float32))
    np.save(d / "pair_ids.npy", np.ascontiguousarray(pair_ids, np.int64))
    meta = {
        "version": _INDEX_VERSION,
        "rows": int(embeddings.shape[0]),
        "dim": int(embeddings.shape[1]),
        "has_store": image_embeddings is not None,
    }
    if image_embeddings is not None:
        np.save(d / "store.npy", np.ascontiguousarray(image_embeddings, np.float16))
        meta["store_shape"] = [int(s) for s in image_embeddings.shape]
    (d / "meta.json").write_text(_json.dumps(meta))


def load_gallery_index(path) -> Dict[str, np.ndarray]:
    """Load an artifact written by save_gallery_index. Returns
    {"embeddings", "pair_ids", "store" (mmap'd fp16 or None)}. Fails fast on
    a missing/foreign directory (the same hard-fail convention as explicit
    checkpoint paths, cor_tpu/cli/train.py)."""
    import json as _json
    from pathlib import Path as _Path

    d = _Path(path)
    meta_p = d / "meta.json"
    if not meta_p.exists():
        raise FileNotFoundError(f"gallery index {d} has no meta.json — not an index artifact")
    meta = _json.loads(meta_p.read_text())
    if meta.get("version") != _INDEX_VERSION:
        raise ValueError(f"gallery index version {meta.get('version')} != {_INDEX_VERSION}")
    out = {
        "embeddings": np.load(d / "embeddings.npy"),
        "pair_ids": np.load(d / "pair_ids.npy"),
        "store": None,
    }
    if meta.get("has_store"):
        out["store"] = np.load(d / "store.npy", mmap_mode="r")
    if out["embeddings"].shape[0] != meta["rows"]:
        raise ValueError("gallery index corrupt: row count mismatch with meta.json")
    return out
