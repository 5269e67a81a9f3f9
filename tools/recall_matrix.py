"""System-level retrieval accuracy matrix on the real chip.

Measures {fp32, int8} x {exact, approx} x {rescore off/on} over COR127K-scale
clustered galleries (408 classes of Gaussian blobs, the category count of the
benchmark, at decreasing spread) plus the isotropic control, reporting
Recall@{1,5,10} against known targets and top-10 agreement vs the fp32-exact
scan. This is the accuracy half of the retrieval north star in the only form
this environment can measure (no COR127K split is mounted — VERDICT.md r3
item 1); the reference has no gallery-scan code at all (SURVEY.md §0).

Two query regimes per gallery:
  probe_noise=0.0   queries ARE gallery rows (the bench.py self-Recall probe)
  probe_noise=0.05  realistic-margin variant: queries are perturbed rows, so
                    even fp32-exact Recall@1 < 1 at tight cluster spread

The rescore stage here runs ON DEVICE (gather the widened pool's fp32 rows +
exact re-top-k) with math identical to RetrievalEngine(rescore=True)'s host
rescore — engine mechanics are pinned by
tests/test_retrieval.py::test_rescore_recovers_int8_ranking_loss; this tool
measures the accuracy numbers at full scale without shipping 130 MB galleries
over the relay tunnel.

Also reports the decode-rerank POOL recovery: the fraction of the fp32-exact
top-10 contained in the union of 8 per-shard int8+approx top-10s — the
candidate pool make_sharded_retrieve_decode ranks by IoU on an 8-chip mesh.
Pool containment bounds what ANY reranker (decoder-IoU included) can recover;
the IoU ordering itself needs trained weights to be meaningful.

  python tools/recall_matrix.py [--gallery-rows 127166] [--queries 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery-rows", type=int, default=127_166)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rescore-width", type=int, default=4)
    ap.add_argument("--rescore-recall-target", type=float, default=0.999,
                    help="approx_max_k recall target for the WIDENED rescore "
                         "pool (RetrievalEngine's rescore default: the "
                         "two-stage residual is first-stage pool misses, "
                         "closed by the tighter target)")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from cor_tpu.retrieval.engine import (
        _quantize_queries_in_graph,
        cosine_scores_int8,
    )

    G, Q, K, D = args.gallery_rows, args.queries, args.k, 256
    KSCAN = args.rescore_width * K
    N_SHARDS = 8  # pool-recovery simulation of an 8-chip sharded scan

    @partial(jax.jit, static_argnames=("k", "approx", "rt"))
    def scan_fp32(q, g, k, approx, rt=0.99):
        # engine-default precision: on TPU this is bf16 multiplies with fp32
        # accumulation — the DEPLOYED fp32 scan's real numerics
        s = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        if approx:
            return jax.lax.approx_max_k(s, k, recall_target=rt)
        return jax.lax.top_k(s, k)

    @partial(jax.jit, static_argnames=("k",))
    def scan_true_fp32(q, g, k):
        # the agreement reference: TRUE fp32 multiplies (precision=HIGHEST),
        # the same numerics as the engine's host numpy rescore stage
        s = jnp.dot(q, g.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, k)

    @partial(jax.jit, static_argnames=("k", "approx", "rt"))
    def scan_int8(q, gq, gs, k, approx, rt=0.99):
        qq, qs = _quantize_queries_in_graph(q)
        s = cosine_scores_int8(qq, qs, gq, gs)
        if approx:
            return jax.lax.approx_max_k(s, k, recall_target=rt)
        return jax.lax.top_k(s, k)

    @jax.jit
    def rescore_pool(q, g, pool_idx):
        # exact fp32 second stage: TRUE cosine of each pooled row
        # (precision=HIGHEST — fp32 multiplies, not the MXU's default bf16
        # passes), re-top-k; the same math RetrievalEngine._exact_rescore
        # runs on host in numpy
        rows = g[pool_idx]  # [Q, KSCAN, D]
        s = jnp.einsum("qd,qkd->qk", q, rows,
                       precision=jax.lax.Precision.HIGHEST)
        sc, pos = jax.lax.top_k(s, K)
        return sc, jnp.take_along_axis(pool_idx, pos, axis=1)

    @jax.jit
    def quantize_dev(g):
        s = jnp.maximum(jnp.max(jnp.abs(g), axis=1) / 127.0, 1e-12)
        qv = jnp.clip(jnp.round(g / s[:, None]), -127, 127).astype(jnp.int8)
        return qv, s.astype(jnp.float32)

    @partial(jax.jit, static_argnames=("k",))
    def sharded_int8_pool(q, gq, gs, k):
        # union of per-shard int8+approx local top-k (global row ids) — the
        # decode-rerank candidate pool on an 8-way mesh
        Gp = gq.shape[0]
        per = Gp // N_SHARDS
        qq, qs = _quantize_queries_in_graph(q)

        def shard(i):
            sl_q = jax.lax.dynamic_slice_in_dim(gq, i * per, per)
            sl_s = jax.lax.dynamic_slice_in_dim(gs, i * per, per)
            s = cosine_scores_int8(qq, qs, sl_q, sl_s)
            _, li = jax.lax.approx_max_k(s, k, recall_target=0.99)
            return li + i * per

        return jnp.concatenate([shard(i) for i in range(N_SHARDS)], axis=1)

    def overlap(ref, got):
        return float(np.mean(
            [len(set(ref[i]) & set(got[i])) / K for i in range(ref.shape[0])]
        ))

    def recalls(idx, targets):
        return {
            f"r@{k}": round(float(
                (idx[:, :k] == targets[:, None]).any(axis=1).mean()
            ), 4)
            for k in (1, 5, 10)
        }

    rng = np.random.default_rng(0)
    results = {}
    header = (
        f"{'gallery':>10s} {'qnoise':>6s} {'config':>22s} "
        f"{'r@1':>7s} {'r@5':>7s} {'r@10':>7s} {'top10-agree':>11s}"
    )
    print(header)
    print("-" * len(header))

    for sigma in (None, 0.5, 0.2, 0.1, 0.05):
        gname = "isotropic" if sigma is None else f"sigma={sigma}"
        if sigma is None:
            g = jax.random.normal(jax.random.PRNGKey(5), (G, D), jnp.float32)
        else:
            centers = rng.standard_normal((408, D)).astype(np.float32)
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            labels = jnp.asarray(rng.integers(0, 408, G).astype(np.int32))
            noise = jax.random.normal(
                jax.random.PRNGKey(int(sigma * 1000)), (G, D), jnp.float32
            )
            g = jnp.asarray(centers)[labels] + sigma * noise
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        gq, gs = quantize_dev(g)

        # pad to a multiple of N_SHARDS for the pool simulation (zero rows
        # score 0 and never enter a top-k of real normed rows at these sizes)
        pad = (-G) % N_SHARDS
        gq_p = jnp.concatenate([gq, jnp.zeros((pad, D), jnp.int8)]) if pad else gq
        gs_p = jnp.concatenate([gs, jnp.ones((pad,), jnp.float32)]) if pad else gs

        for qnoise in (0.0, 0.05):
            targets = rng.integers(0, G, Q)
            probe = g[jnp.asarray(targets.astype(np.int32))]
            if qnoise:
                probe = probe + qnoise * jax.random.normal(
                    jax.random.PRNGKey(11), (Q, D), jnp.float32
                )
                probe = probe / jnp.linalg.norm(probe, axis=1, keepdims=True)

            _, ref_i = scan_true_fp32(probe, g, K)
            ref_i = np.asarray(ref_i)
            key = f"{gname}/qnoise={qnoise}"
            rows = {}

            RT = args.rescore_recall_target
            configs = [
                ("fp32-exact", lambda k, rt=0.99: scan_fp32(probe, g, k, False)),
                ("fp32-approx", lambda k, rt=0.99: scan_fp32(probe, g, k, True, rt)),
                ("int8-exact", lambda k, rt=0.99: scan_int8(probe, gq, gs, k, False)),
                ("int8-approx", lambda k, rt=0.99: scan_int8(probe, gq, gs, k, True, rt)),
            ]
            for name, fn in configs:
                _, i1 = fn(K)
                i1 = np.asarray(i1)
                row = dict(recalls(i1, targets), agree=round(overlap(ref_i, i1), 4))
                rows[name] = row
                print(f"{gname:>10s} {qnoise:>6.2f} {name:>22s} "
                      f"{row['r@1']:>7.4f} {row['r@5']:>7.4f} {row['r@10']:>7.4f} "
                      f"{row['agree']:>11.4f}")
                # + rescore: widened pool (approx scans at the tighter
                # rescore recall target — the engine's rescore=True default)
                # -> exact fp32 second stage
                _, pool = fn(KSCAN, RT)
                _, i2 = rescore_pool(probe, g, pool)
                i2 = np.asarray(i2)
                row2 = dict(recalls(i2, targets), agree=round(overlap(ref_i, i2), 4))
                rows[name + "+rescore"] = row2
                print(f"{gname:>10s} {qnoise:>6.2f} {name + '+rescore':>22s} "
                      f"{row2['r@1']:>7.4f} {row2['r@5']:>7.4f} {row2['r@10']:>7.4f} "
                      f"{row2['agree']:>11.4f}")

            # decode-rerank pool recovery (8-shard int8+approx union)
            pool8 = np.asarray(sharded_int8_pool(probe, gq_p, gs_p, K))
            contain = float(np.mean(
                [len(set(ref_i[i]) & set(pool8[i])) / K for i in range(Q)]
            ))
            rows["rerank-pool-containment"] = round(contain, 4)
            print(f"{gname:>10s} {qnoise:>6.2f} {'rerank-pool(8x10)':>22s} "
                  f"{'-':>7s} {'-':>7s} {'-':>7s} {contain:>11.4f}")
            results[key] = rows

    print(json.dumps(results))


if __name__ == "__main__":
    main()
