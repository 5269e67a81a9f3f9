"""Headline benchmark: composed-object-retrieval pipeline throughput on one
TPU chip.

One compiled graph per iteration, exactly the BASELINE.json north star:
batched query encoding (support branch: SigLIP image+text towers +
mask-adapter pooling + fusion), cosine scoring against the gallery, top-k
selection, and SAM mask decoding of every retrieved candidate (reusing the
gallery's precomputed image embeddings).

Metric: gallery candidates fully processed (scored + top-k mask-decoded) per
second per chip. Baseline: 5,000/sec/chip (BASELINE.json north-star target).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from cor_tpu.models.core_model import CoreConfig, _cast, init_core_model
    from cor_tpu.models.prompt_encoder import get_dense_pe, prompt_encoder_dense
    from cor_tpu.models.sam_decoder import mask_decoder
    from cor_tpu.models.support_branch import support_branch

    cfg = CoreConfig(
        sam_model="sam_base",
        siglip_model="ViT-B-16-SigLIP-384",
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )

    Q = 16  # queries per pipeline iteration
    K = 64  # candidates retrieved + mask-decoded + IoU-re-ranked per query
    G = 4096  # gallery rows scored per query
    STORE = 128  # precomputed candidate image embeddings resident in HBM
    CHUNK = 128  # decode micro-batch (bounds live [*, 4096, 256] activations)

    rng = np.random.default_rng(0)
    params = init_core_model(jax.random.PRNGKey(0), cfg)
    # keep the big frozen towers in bf16 on-device (inference-style residency)
    params = jax.device_put(_cast(params, jnp.bfloat16))

    gallery = rng.standard_normal((G, 256)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    gallery = jnp.asarray(gallery)
    # candidate SAM image embeddings [STORE, 64, 64, 256]; retrieved ids map
    # into the store modulo its size (memory-bounded stand-in for an HBM shard).
    # The constant dense no-mask prompt is pre-baked into the store at
    # indexing time (mask_decoder accepts dense=None), saving a full HBM pass
    # per decode chunk.
    cand_store = jnp.asarray(
        rng.standard_normal((STORE, 64, 64, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    no_mask = _cast(params, jnp.bfloat16)["prompt_encoder"]["no_mask_embed"][0]
    cand_store = cand_store + no_mask

    support_img = jnp.asarray(rng.standard_normal((Q, 384, 384, 3), dtype=np.float32))
    text = jnp.asarray(rng.integers(2, 32000, (Q, 64)).astype(np.int32))
    support_mask = jnp.asarray((rng.random((Q, 384, 384, 1)) > 0.5).astype(np.float32))

    def pipeline(
        params, support_img, text, support_mask, gallery, cand_store,
        store_scale=None,
    ):
        p = _cast(params, cfg.dtype)
        # 1) encode composed queries -> retrieval space [Q, 256]
        qfeat = support_branch(
            p["support_branch"],
            support_img.astype(cfg.dtype),
            text,
            support_mask.astype(cfg.dtype),
            cfg.support,
            train=False,
        )[:, 0, :]
        # 2) score the gallery + top-k
        scores = jnp.dot(
            qfeat.astype(jnp.float32), gallery.T, preferred_element_type=jnp.float32
        )
        top_scores, top_idx = jax.lax.top_k(scores, K)  # [Q, K]
        # 3) mask-decode every retrieved candidate (chunked micro-batches so
        #    the [*, 4096, 256] decoder activations stay HBM-bounded), then
        #    re-rank candidates by the decoder's predicted mask IoU
        flat_idx = top_idx.reshape(-1) % cand_store.shape[0]  # [Q*K]
        prompts = jnp.repeat(qfeat, K, axis=0)[:, None, :]  # [Q*K, 1, 256]
        image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cfg.dtype)

        # int8 stores stay int8 (the kernel dequantizes in VMEM after the 4x
        # smaller DMA); bf16/fp32 stores run at the compute dtype
        store_arg = cand_store if store_scale is not None else cand_store.astype(cfg.dtype)

        def decode_chunk(args):
            idx_c, prompts_c = args
            # store-indexed decode: the first fused two-way layer reads
            # cand_store[idx_c[b]] directly via scalar-prefetch block
            # indexing — the batched gather (XLA: slice loop + full
            # layout-fix copy, ~13 ms/iteration traced) never materializes
            masks, iou, _ = mask_decoder(
                p["mask_decoder"],
                store_arg,
                image_pe,
                prompts_c.astype(cfg.dtype),
                None,  # dense prompt pre-baked into cand_store
                cfg.decoder,
                multimask_output=False,
                fused=True,
                store_idx=idx_c,
                store_scale=store_scale,
            )
            # per-candidate summary: predicted IoU + mask area (kept small so
            # the full mask tensor never leaves the chunk)
            area = jnp.mean((masks > 0).astype(jnp.float32), axis=(1, 2, 3))
            return iou[:, 0], area, masks.astype(jnp.float32).sum()

        n_chunks = (Q * K) // CHUNK
        iou_flat, area_flat, mask_sums = jax.lax.map(
            decode_chunk,
            (
                flat_idx.reshape(n_chunks, CHUNK),
                prompts.reshape(n_chunks, CHUNK, 1, 256),
            ),
        )
        # re-rank each query's K candidates by predicted mask quality
        iou_qk = iou_flat.reshape(Q, K)
        order = jnp.argsort(-iou_qk, axis=1)
        reranked_idx = jnp.take_along_axis(top_idx, order, axis=1)
        # scalar checksum: fetching it on the host forces real completion
        # (block_until_ready returns at dispatch on the axon relay backend)
        checksum = (
            mask_sums.sum() + top_scores.sum() + area_flat.sum() + reranked_idx.sum()
        )
        return top_scores, reranked_idx, iou_qk, checksum

    iters = 20

    # The timing loop runs ON DEVICE (lax.scan, one dispatch): host-side
    # python loops over the axon relay mis-time sub-100ms computations — the
    # relay adds per-dispatch latency, and rebinding prior outputs lets
    # not-yet-started queued computations be dropped. Each scan step perturbs
    # the inputs (i-dependent epsilon) so XLA cannot CSE the iterations.
    def pipeline_n(params, support_img, text, support_mask, gallery, cand_store):
        def body(carry, i):
            si = support_img + i.astype(jnp.float32) * 1e-6
            *_, checksum = pipeline(
                params, si, text, support_mask, gallery, cand_store
            )
            return carry + checksum, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(pipeline_n)
    args = (params, support_img, text, support_mask, gallery, cand_store)

    # warmup / compile (fetch the checksum to synchronize)
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    dt = time.perf_counter() - t0

    candidates_per_sec = (Q * K * iters) / dt

    # ------------------------------------------------------------------
    # Realistic-store check: STORE=128 gives the decode path a hot 0.27 GB
    # working set with heavy index reuse. A deployed gallery shard is colder:
    # re-time with a 4.3 GB resident store (2048 unique [64,64,256] bf16
    # rows — every top-idx maps to a distinct row, defeating reuse) and
    # report the honest delta next to the headline.
    # ------------------------------------------------------------------
    STORE_BIG = 2048
    big_iters = 10
    # generated ON DEVICE: a 4.3 GB host->device ship over the relay tunnel
    # takes tens of minutes; jax.random.normal on-chip is instant
    big_store = (
        jax.random.normal(
            jax.random.PRNGKey(7), (STORE_BIG, 64, 64, 256), dtype=jnp.bfloat16
        )
        + no_mask
    )

    def pipeline_big(params, support_img, text, support_mask, gallery, cand_store):
        def body(carry, i):
            si = support_img + i.astype(jnp.float32) * 1e-6
            *_, checksum = pipeline(params, si, text, support_mask, gallery, cand_store)
            return carry + checksum, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(big_iters))
        return c

    fn_big = jax.jit(pipeline_big)
    args_big = (params, support_img, text, support_mask, gallery, big_store)
    float(fn_big(*args_big))
    t0 = time.perf_counter()
    float(fn_big(*args_big))
    big_dt = time.perf_counter() - t0
    candidates_per_sec_big_store = (Q * K * big_iters) / big_dt

    # ------------------------------------------------------------------
    # int8-quantized candidate store at the same 2048 rows: 1.1 GB instead
    # of 4.3 (4x more store rows per chip before HBM spills) and ~4x less
    # inbound keys DMA on the first decode layer — the kernel dequantizes
    # each tile in VMEM (per-row symmetric scales, quantized ON DEVICE).
    # Accuracy is measured, not assumed: rerank agreement + IoU drift vs
    # the bf16 store on identical inputs.
    # ------------------------------------------------------------------
    from cor_tpu.retrieval.engine import quantize_candidate_store

    # quantize the ALREADY-RESIDENT big_store (no_mask is pre-baked in it) —
    # a second 4.3 GB source array would waste half the chip's HBM
    store_q, store_scales = jax.jit(
        lambda s: quantize_candidate_store(s, None)
    )(big_store)

    def pipeline_int8(params, support_img, text, support_mask, gallery, cand_store, scales):
        def body(carry, i):
            si = support_img + i.astype(jnp.float32) * 1e-6
            *_, checksum = pipeline(
                params, si, text, support_mask, gallery, cand_store,
                store_scale=scales,
            )
            return carry + checksum, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(big_iters))
        return c

    fn_i8 = jax.jit(pipeline_int8)
    args_i8 = (params, support_img, text, support_mask, gallery, store_q, store_scales)
    float(fn_i8(*args_i8))
    t0 = time.perf_counter()
    float(fn_i8(*args_i8))
    i8_dt = time.perf_counter() - t0
    candidates_per_sec_int8_store = (Q * K * big_iters) / i8_dt

    # accuracy probe: one pipeline call each on identical inputs. The
    # decisive number is the predicted-IoU drift vs the bf16 store; the
    # rerank order itself is noise-dominated under RANDOM weights (all
    # random store rows are statistically identical, so the per-candidate
    # IoU spread is tiny and any rounding reorders it) — report the spread
    # next to the drift so the two are comparable.
    _, _, iou_bf16, _ = jax.jit(pipeline)(*args_big)
    _, _, iou_i8, _ = jax.jit(
        lambda *a: pipeline(*a[:6], store_scale=a[6])
    )(*args_i8)
    iou_bf16 = np.asarray(iou_bf16, np.float32)
    iou_i8 = np.asarray(iou_i8, np.float32)
    int8_store_iou_drift = float(np.max(np.abs(iou_bf16 - iou_i8)))
    iou_candidate_spread = float(np.std(iou_bf16))

    # ------------------------------------------------------------------
    # Second metric: COR127K-scale full-gallery scan (127,166 rows — the
    # benchmark's triplet count) + self-consistent Recall@1. Queries ARE
    # gallery rows, so exact top-1 self-retrieval is the correctness check
    # (ties are measure-zero for random normed vectors).
    # ------------------------------------------------------------------
    G127 = 127_166
    QB = 256
    # generated ON DEVICE: shipping a 130 MB host gallery over the relay
    # tunnel costs minutes per run and measures nothing
    g127_dev = jax.random.normal(jax.random.PRNGKey(5), (G127, 256), jnp.float32)
    g127_dev = g127_dev / jnp.linalg.norm(g127_dev, axis=1, keepdims=True)

    @jax.jit
    def scan127(queries, gallery):
        s = jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32)
        # TPU-native approximate top-k (19x over the sort-based exact top_k
        # at this gallery size); self-Recall@1 below is MEASURED on its output
        return jax.lax.approx_max_k(s, 10, recall_target=0.99)

    probe_rows = rng.integers(0, G127, QB)
    probe = g127_dev[jnp.asarray(probe_rows.astype(np.int32))]
    top_s, top_i = scan127(probe, g127_dev)  # warmup/compile
    recall1 = float(np.mean(np.asarray(top_i)[:, 0] == probe_rows))

    # 20 iterations gave a ~35 ms timing window — short enough that relay
    # dispatch/fetch noise produced a 111k-170k q/s run-to-run spread; 100
    # iterations (~0.2 s device) stabilizes the number at negligible cost
    scan_iters = 100

    @jax.jit
    def scan127_n(queries, gallery):
        def body(carry, i):
            qi = queries + i.astype(jnp.float32) * 1e-7  # defeat CSE
            ts, ti = scan127(qi, gallery)
            return carry + ti.sum(), None
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(scan_iters))
        return c

    int(scan127_n(probe, g127_dev))  # warmup/compile
    t0 = time.perf_counter()
    int(scan127_n(probe, g127_dev))
    scan_dt = time.perf_counter() - t0
    full_gallery_qps = QB * scan_iters / scan_dt

    # ------------------------------------------------------------------
    # approx_max_k on a CLUSTERED gallery: real embedding galleries are not
    # isotropic — near-duplicate objects sit at small angular margins. Build
    # 408 classes (COR127K's category count) of per-class Gaussian blobs at
    # decreasing spread and measure approx-vs-exact top-10 overlap and
    # self-Recall@1 of the approximate scan at each margin.
    # ------------------------------------------------------------------
    @jax.jit
    def scan127_exact(queries, gallery):
        s = jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, 10)

    # ------------------------------------------------------------------
    # int8 per-row-quantized scan (cor_tpu.retrieval.engine scheme): the
    # scoring GEMM runs int8 x int8 -> int32 on the MXU with 4x less gallery
    # HBM traffic than fp32 — the production configuration for galleries
    # that outgrow HBM at fp32. Quantized ON DEVICE; accuracy is measured,
    # not assumed (self-Recall@1 + top-10 overlap vs the exact fp32 scan).
    # ------------------------------------------------------------------
    from cor_tpu.retrieval.engine import _quantize_queries_in_graph, cosine_scores_int8

    @jax.jit
    def quantize_dev(g):
        s = jnp.maximum(jnp.max(jnp.abs(g), axis=1) / 127.0, 1e-12)
        q = jnp.clip(jnp.round(g / s[:, None]), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.float32)

    g127_q, g127_s = quantize_dev(g127_dev)

    @jax.jit
    def scan127_int8(queries, gq, gs):
        qq, qs = _quantize_queries_in_graph(queries)
        s = cosine_scores_int8(qq, qs, gq, gs)
        return jax.lax.approx_max_k(s, 10, recall_target=0.99)

    _, i8_i = scan127_int8(probe, g127_q, g127_s)
    i8_i = np.asarray(i8_i)
    recall1_int8 = float(np.mean(i8_i[:, 0] == probe_rows))
    _, exact_i_iso = scan127_exact(probe, g127_dev)
    exact_i_iso = np.asarray(exact_i_iso)
    overlap_int8 = float(
        np.mean([len(set(exact_i_iso[r]) & set(i8_i[r])) / 10.0 for r in range(QB)])
    )

    # two-stage exact rescore (RetrievalEngine(rescore=True) math): int8+
    # approx first stage at 4x-widened k AND the engine's rescore-mode
    # recall_target=0.999 default (r5: the residual was first-stage pool
    # misses at 0.99 — 0.9988 here), exact TRUE-fp32 second stage over the
    # pool — the accuracy-recovery column (full matrix in BASELINE.md)
    @jax.jit
    def scan127_int8_rescored(queries, gq, gs, g):
        qq, qs = _quantize_queries_in_graph(queries)
        s = cosine_scores_int8(qq, qs, gq, gs)
        _, pool = jax.lax.approx_max_k(s, 40, recall_target=0.999)
        rows = g[pool]  # [Q, 40, D]
        sr = jnp.einsum("qd,qkd->qk", queries, rows,
                        precision=jax.lax.Precision.HIGHEST)
        sc, pos = jax.lax.top_k(sr, 10)
        return sc, jnp.take_along_axis(pool, pos, axis=1)

    @jax.jit
    def scan127_true_exact(queries, gallery):
        s = jnp.dot(queries, gallery.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, 10)

    _, rs_i = scan127_int8_rescored(probe, g127_q, g127_s, g127_dev)
    _, true_i = scan127_true_exact(probe, g127_dev)
    rs_i, true_i = np.asarray(rs_i), np.asarray(true_i)
    overlap_int8_rescored = float(
        np.mean([len(set(true_i[r]) & set(rs_i[r])) / 10.0 for r in range(QB)])
    )

    @jax.jit
    def scan127_int8_n(queries, gq, gs):
        def body(carry, i):
            qi = queries + i.astype(jnp.float32) * 1e-7  # defeat CSE
            ts, ti = scan127_int8(qi, gq, gs)
            return carry + ti.sum(), None

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(scan_iters))
        return c

    int(scan127_int8_n(probe, g127_q, g127_s))  # warmup/compile
    t0 = time.perf_counter()
    int(scan127_int8_n(probe, g127_q, g127_s))
    int8_qps = QB * scan_iters / (time.perf_counter() - t0)

    n_classes = 408
    centers = rng.standard_normal((n_classes, 256)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_dev = jnp.asarray(centers)
    cluster_stats = {}
    for sigma in (0.5, 0.2, 0.1, 0.05):
        # members assembled ON DEVICE (host->device gallery ships are slow
        # over the relay): normalize(center[label] + sigma * noise)
        labels = jnp.asarray(rng.integers(0, n_classes, G127).astype(np.int32))
        noise = jax.random.normal(
            jax.random.PRNGKey(int(sigma * 1000)), (G127, 256), jnp.float32
        )
        gc_dev = centers_dev[labels] + sigma * noise
        gc_dev = gc_dev / jnp.linalg.norm(gc_dev, axis=1, keepdims=True)
        probe_rows_c = rng.integers(0, G127, QB)
        probe_c = gc_dev[jnp.asarray(probe_rows_c.astype(np.int32))]
        _, exact_i = scan127_exact(probe_c, gc_dev)
        _, approx_i = scan127(probe_c, gc_dev)
        exact_i, approx_i = np.asarray(exact_i), np.asarray(approx_i)
        overlap = np.mean(
            [len(set(exact_i[r]) & set(approx_i[r])) / 10.0 for r in range(QB)]
        )
        r1 = float(np.mean(approx_i[:, 0] == probe_rows_c))
        cluster_stats[f"sigma_{sigma}"] = {
            "approx_vs_exact_top10_overlap": round(float(overlap), 4),
            "approx_self_recall_at_1": round(r1, 4),
        }

    baseline = 5000.0
    print(
        json.dumps(
            {
                "metric": "gallery candidates scored+mask-decoded per sec per chip",
                "value": round(candidates_per_sec, 2),
                "unit": "candidates/sec/chip",
                "vs_baseline": round(candidates_per_sec / baseline, 4),
                "extra": {
                    "cor127k_full_gallery_queries_per_sec": round(full_gallery_qps, 2),
                    "cor127k_gallery_rows": G127,
                    "self_recall_at_1": recall1,
                    "cor127k_int8_queries_per_sec": round(int8_qps, 2),
                    "int8_self_recall_at_1": round(recall1_int8, 4),
                    "int8_vs_exact_top10_overlap": round(overlap_int8, 4),
                    "int8_approx_rescored_vs_truefp32_top10_overlap": round(
                        overlap_int8_rescored, 4
                    ),
                    "realistic_store_candidates_per_sec": round(
                        candidates_per_sec_big_store, 2
                    ),
                    "realistic_store_rows": STORE_BIG,
                    "int8_store_candidates_per_sec": round(
                        candidates_per_sec_int8_store, 2
                    ),
                    "int8_store_iou_drift": round(int8_store_iou_drift, 5),
                    "iou_candidate_spread": round(iou_candidate_spread, 5),
                    "clustered_gallery_approx_recall": cluster_stats,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
