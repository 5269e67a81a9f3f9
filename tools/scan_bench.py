"""Gallery-scan scaling benchmark: how far ONE chip's full-gallery scan
goes beyond COR127K (127,166 rows — the benchmark's triplet count).

For each gallery size, measures full-gallery cosine scoring + top-10
`approx_max_k` selection throughput (queries/sec/chip) for fp32 and for the
int8 per-row-quantized production scheme (cor_tpu.retrieval.engine), plus
approximate-scan self-Recall@1 as the correctness check (queries ARE
gallery rows). Everything is generated and quantized ON DEVICE (shipping a
multi-GB host gallery over the axon relay measures nothing), and timed with
the single-dispatch device-side lax.scan protocol (bench.py is the
template; host loops over the relay mis-time sub-100ms work).

Memory at 256-d: fp32 rows are 1 KB (16 GB HBM ~ 14M rows minus workspace);
int8 rows are 256 B (~4x more rows per chip).

  python tools/scan_bench.py                    # default size sweep
  python tools/scan_bench.py --sizes 127166,1048576,4194304 [--skip-fp32]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes",
        default="127166,524288,1048576,2097152,4194304",
        help="comma-separated gallery row counts",
    )
    ap.add_argument("--qb", type=int, default=256, help="queries per batch")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--skip-fp32", action="store_true",
        help="int8 only (for sizes whose fp32 gallery would not fit HBM)",
    )
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.retrieval.engine import _quantize_queries_in_graph, cosine_scores_int8

    QB, K = args.qb, args.k
    rng = np.random.default_rng(0)

    for G in [int(s) for s in args.sizes.split(",")]:
        # device-side gallery: normalized random rows
        gal = jax.random.normal(jax.random.PRNGKey(5), (G, 256), jnp.float32)
        gal = gal / jnp.linalg.norm(gal, axis=1, keepdims=True)

        probe_rows = rng.integers(0, G, QB)
        probe = gal[jnp.asarray(probe_rows.astype(np.int32))]
        # scale iterations so the timed window stays ~0.2 s device time
        # regardless of per-iteration cost (relay dispatch noise amortizes)
        iters = max(10, int(round(100 * 127_166 / G)))

        def timed_qps(scan_fn, *operands):
            @jax.jit
            def scan_n(queries, *ops):
                def body(carry, i):
                    qi = queries + i.astype(jnp.float32) * 1e-7  # defeat CSE
                    _, ti = scan_fn(qi, *ops)
                    return carry + ti.sum(), None

                c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
                return c

            int(scan_n(probe, *operands))  # warmup/compile
            t0 = time.perf_counter()
            int(scan_n(probe, *operands))
            return QB * iters / (time.perf_counter() - t0)

        row = {"rows": G, "iters": iters}

        if not args.skip_fp32:
            @jax.jit
            def scan_fp32(queries, gallery):
                s = jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32)
                return jax.lax.approx_max_k(s, K, recall_target=0.99)

            _, ti = scan_fp32(probe, gal)
            row["fp32_self_recall_at_1"] = float(
                np.mean(np.asarray(ti)[:, 0] == probe_rows)
            )
            row["fp32_qps"] = round(timed_qps(scan_fp32, gal), 1)
            row["fp32_gallery_gb"] = round(G * 256 * 4 / 2**30, 2)

        @jax.jit
        def quantize_dev(g):
            s = jnp.maximum(jnp.max(jnp.abs(g), axis=1) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(g / s[:, None]), -127, 127).astype(jnp.int8)
            return q, s.astype(jnp.float32)

        gq, gs = quantize_dev(gal)
        del gal  # free the fp32 gallery before timing int8 at big sizes

        @jax.jit
        def scan_int8(queries, gq, gs):
            qq, qs = _quantize_queries_in_graph(queries)
            s = cosine_scores_int8(qq, qs, gq, gs)
            return jax.lax.approx_max_k(s, K, recall_target=0.99)

        _, ti = scan_int8(probe, gq, gs)
        row["int8_self_recall_at_1"] = float(
            np.mean(np.asarray(ti)[:, 0] == probe_rows)
        )
        row["int8_qps"] = round(timed_qps(scan_int8, gq, gs), 1)
        row["int8_gallery_gb"] = round(G * 256 / 2**30, 2)
        row["int8_candidates_per_sec"] = round(row["int8_qps"] * G, 0)

        print(row, flush=True)


if __name__ == "__main__":
    main()
