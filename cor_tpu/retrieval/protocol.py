"""End-to-end retrieval accuracy protocol: Recall@K over a triplet manifest.

The COR task (reference README.md:32-33): given a support image + support
object mask + change text, retrieve the target object among gallery
candidates. The reference repo computes Recall@K offline from dumped masks
(no gallery-scan code to port — SURVEY.md §0); this protocol makes it a
first-class measured API, per the BASELINE.json north star (Recall@1 within
0.5 pts of the reference protocol).

Protocol (target = the query's own gallery object):
- every triplet row contributes ONE gallery candidate — its (query image,
  query GT mask) pair, embedded by mask-pooling the SAM image embedding
  (cor_tpu.retrieval.index.make_candidate_encoder);
- every row is also ONE query — its (support image, support mask, change
  text), embedded by the support branch;
- query i's correct answer is gallery row i; Recall@K = fraction of queries
  whose own object appears in the cosine top-K.

Runs on any loader that yields CORDataset/SyntheticDataset-shaped batches,
so the same code path serves synthetic smoke tests and the real COR127K
manifest.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cor_tpu.models.core_model import CoreConfig
from cor_tpu.retrieval.engine import RetrievalEngine, recall_at_k
from cor_tpu.retrieval.index import make_candidate_encoder, make_query_encoder


def encode_manifest(
    cfg: CoreConfig,
    params,
    batches: Iterable[Dict[str, np.ndarray]],
    keep_store: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[Tuple[np.ndarray, np.ndarray]]]:
    """One pass over the triplet loader -> (gallery [G, D], queries [G, D],
    pair_ids [G], store or None). Row i of every output comes from triplet
    i; ``keep_store`` also keeps each SAM image embedding (for
    decode-reranked retrieval) as an int8 per-row-quantized
    ``(q [G, g, g, C], scales [G])`` pair with the dense no-mask prompt
    pre-baked — quantized batch-by-batch so the full-precision store (fp32
    ~266 GB at COR127K scale) never exists on host. Feed the pair straight
    to RetrievalEngine.enable_store_decode."""
    from cor_tpu.retrieval.engine import quantize_candidate_store_host

    encode_cand = make_candidate_encoder(cfg)
    encode_query = make_query_encoder(cfg)
    no_mask = (
        np.asarray(params["prompt_encoder"]["no_mask_embed"][0]) if keep_store else None
    )
    gallery, queries, ids, store_qs, store_scales = [], [], [], [], []
    for b in batches:
        emb, ie = encode_cand(
            params, jnp.asarray(b["query_img"]), jnp.asarray(b["query_mask"])
        )
        if keep_store:
            q8, sc = quantize_candidate_store_host(np.asarray(ie), no_mask)
            store_qs.append(q8)
            store_scales.append(sc)
        q = encode_query(
            params,
            jnp.asarray(b["support_img"]),
            jnp.asarray(b["text"]),
            jnp.asarray(b["support_mask"]),
        )
        gallery.append(np.asarray(emb))
        queries.append(np.asarray(q))
        ids.append(np.asarray(b["pair_id"]))
    return (
        np.concatenate(gallery, axis=0),
        np.concatenate(queries, axis=0),
        np.concatenate(ids, axis=0),
        (np.concatenate(store_qs, axis=0), np.concatenate(store_scales, axis=0))
        if keep_store
        else None,
    )


def _make_decode_retriever(cfg, params, store, no_mask_embed=None):
    """Shared rerank wiring for both protocol entry points: returns a
    make_retrieve(engine) that arms the engine's sharded store decode
    (``store`` is either the pre-quantized pair from
    encode_manifest(keep_store=True) — no_mask already baked — or a raw
    mmap'd array, in which case ``no_mask_embed`` is baked at int8
    quantization time) and retrieves by decoder-IoU rank."""
    from cor_tpu.models.core_model import _cast
    from cor_tpu.models.prompt_encoder import get_dense_pe

    dec_params = _cast(params["mask_decoder"], cfg.dtype)
    image_pe = get_dense_pe(
        _cast(params["prompt_encoder"], cfg.dtype), cfg.prompt
    ).astype(cfg.dtype)

    def make_retrieve(engine):
        engine.enable_store_decode(cfg.decoder, store, no_mask_embed=no_mask_embed)
        return lambda q: engine.retrieve_decode(q, dec_params, image_pe)[2]

    return make_retrieve


def _scan_recall(
    mesh, gallery, queries, targets, ks, query_batch, make_retrieve=None,
    approx=False, quantize=False, rescore=False, rescore_width=4,
    recall_target=None,
) -> Dict[str, float]:
    """Shared scan half of every protocol entry point: sharded engine scan
    of (already-encoded) queries against the gallery + Recall@K. Queries are
    L2-normed by the support branch already; normalize defensively so cosine
    stays a dot product. ``make_retrieve(engine)`` may replace the plain
    scan with another [Q, D] -> indices [Q, k] retriever over the same
    engine (the decode-reranked variant). ``approx``/``quantize``/``rescore``
    select the first-stage scan precision and the exact second stage —
    the accuracy of each combination is the matrix in BASELINE.md."""
    g = gallery.shape[0]
    k_max = min(max(ks), g)
    engine = RetrievalEngine(
        mesh, k=k_max, approx=approx, quantize=quantize, rescore=rescore,
        rescore_width=rescore_width, recall_target=recall_target,
    )
    engine.set_gallery(gallery)
    retrieve = (
        (lambda q: engine.retrieve(q)[1])
        if make_retrieve is None
        else make_retrieve(engine)
    )
    queries = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    retrieved = []
    for s in range(0, queries.shape[0], query_batch):
        retrieved.append(np.asarray(retrieve(jnp.asarray(queries[s : s + query_batch]))))
    retrieved = np.concatenate(retrieved, axis=0)  # [Q, k_max]
    out = recall_at_k(retrieved, targets, ks=[k for k in ks if k <= g])
    out["gallery_size"] = float(g)
    return out


def evaluate_retrieval(
    cfg: CoreConfig,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    mesh,
    ks: Tuple[int, ...] = (1, 5, 10),
    query_batch: int = 256,
    rerank: bool = False,
    approx: bool = False,
    quantize: bool = False,
    rescore: bool = False,
    rescore_width: int = 4,
    recall_target: Optional[float] = None,
) -> Dict[str, float]:
    """Full protocol: encode, sharded gallery scan, Recall@K.

    ``rerank=True`` additionally mask-decodes each shard's local top-k
    candidates straight from a mesh-sharded int8 store of their SAM image
    embeddings and ranks the merged pool by predicted mask IoU
    (engine.make_sharded_retrieve_decode) — the decoder-informed variant of
    the protocol; max(ks) candidates are decoded per query per chip.

    ``approx``/``quantize`` select the first-stage scan precision;
    ``rescore=True`` adds the exact fp32 second stage over a widened pool
    (two-stage retrieval — recovers the int8/approx ranking loss).

    Returns {"recall@1": ..., "recall@5": ..., "recall@10": ..., "gallery_size": G}.
    """
    gallery, queries, _, store = encode_manifest(
        cfg, params, loader, keep_store=rerank
    )
    targets = np.arange(gallery.shape[0])
    # store is the already-quantized (q, scales) pair — the dense no-mask
    # prompt was baked in batch-by-batch by encode_manifest
    make_retrieve = _make_decode_retriever(cfg, params, store) if rerank else None
    return _scan_recall(
        mesh, gallery, queries, targets, ks, query_batch, make_retrieve,
        approx=approx, quantize=quantize, rescore=rescore,
        rescore_width=rescore_width, recall_target=recall_target,
    )


def evaluate_retrieval_with_index(
    cfg: CoreConfig,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    mesh,
    index: Dict[str, np.ndarray],
    ks: Tuple[int, ...] = (1, 5, 10),
    query_batch: int = 256,
    rerank: bool = False,
    approx: bool = False,
    quantize: bool = False,
    rescore: bool = False,
    rescore_width: int = 4,
    recall_target: Optional[float] = None,
) -> Dict[str, float]:
    """Serving-mode protocol: queries encoded live, gallery loaded from a
    prebuilt ``cor_tpu.cli.index`` artifact (no candidate re-encoding).

    Each query's target row is located by its manifest pair id in the
    index's pair_ids (NOT by loader position — the index may be built from a
    superset manifest or a different row order). Queries whose pair id is
    absent from the index raise: that is a mismatched artifact, the same
    hard-fail convention as explicit checkpoint paths.

    ``rerank=True`` mask-decodes each shard's local top-k straight from the
    artifact's SAM-embedding store (``cor_tpu.cli.index --with-store``; the
    mmap'd fp16 store is quantized to int8 chunk-by-chunk, never loaded
    whole) and ranks the merged pool by predicted mask IoU — the same
    decode-reranked protocol as evaluate_retrieval(rerank=True).
    """
    encode_query = make_query_encoder(cfg)
    queries, qids = [], []
    for b in loader:
        q = encode_query(
            params,
            jnp.asarray(b["support_img"]),
            jnp.asarray(b["text"]),
            jnp.asarray(b["support_mask"]),
        )
        queries.append(np.asarray(q))
        qids.append(np.asarray(b["pair_id"]))
    queries = np.concatenate(queries, axis=0)
    qids = np.concatenate(qids, axis=0)

    pos = {int(p): i for i, p in enumerate(index["pair_ids"])}
    missing = [int(p) for p in qids if int(p) not in pos]
    if missing:
        raise ValueError(
            f"{len(missing)} query pair ids absent from the gallery index "
            f"(first: {missing[:5]}) — index/manifest mismatch"
        )
    targets = np.asarray([pos[int(p)] for p in qids])

    gallery = np.asarray(index["embeddings"], np.float32)
    make_retrieve = None
    if rerank:
        if index.get("store") is None:
            raise ValueError(
                "rerank needs the SAM image-embedding store in the gallery "
                "index — rebuild it with `cor_tpu.cli.index --with-store`"
            )
        # the artifact's store is raw mmap'd fp16: the dense no-mask prompt
        # is baked in during its chunk-by-chunk int8 quantization
        make_retrieve = _make_decode_retriever(
            cfg, params, index["store"],
            no_mask_embed=np.asarray(params["prompt_encoder"]["no_mask_embed"][0]),
        )
    return _scan_recall(
        mesh, gallery, queries, targets, ks, query_batch, make_retrieve,
        approx=approx, quantize=quantize, rescore=rescore,
        rescore_width=rescore_width, recall_target=recall_target,
    )
