"""Serving-latency A/B: host-streamed vs HBM-resident-int8 candidate store.

Measures per-request latency of `RetrievalServer.handle` (query encode +
sharded scan + top-k candidate mask decode) at flagship geometry on the real
chip, in both decode-store modes:

  host-stream  every request gathers the k retrieved rows from the mmap'd
               fp16 store and device_puts them ([k, 64, 64, 256] fp32 =
               ~4.2 MB/candidate) before the decode dispatch
  store-hbm    the store lives on-device as int8 (quantized once at startup)
               and the decode reads rows store-indexed — nothing ships

  python tools/serve_bench.py [--rows 32] [--k 10] [--requests 20]

Relay caveat: on this axon-tunneled chip the host->device ship crosses an
HTTP relay, so the host-stream numbers are an upper bound vs a real TPU-VM
(PCIe ~16 GB/s would move k x 4.2 MB in ~3 ms). The store-hbm mode's
latency is relay-invariant (fixed-size request inputs only).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32, help="gallery/store rows")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8,
                    help="also A/B micro-batched serving (handle_batch) at "
                         "this batch size; 1 disables")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax

    from cor_tpu.models.core_model import CoreConfig, init_core_model
    from cor_tpu.retrieval.serve import RetrievalServer

    cfg = CoreConfig(
        sam_model="sam_base",
        siglip_model="ViT-B-16-SigLIP-384",
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )
    params = init_core_model(jax.random.PRNGKey(0), cfg)

    # synthetic flagship-shaped index: random unit gallery rows + a random
    # fp16 store (the serve path never looks at source images)
    rng = np.random.default_rng(0)
    g = rng.standard_normal((args.rows, 256)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    index = {
        "embeddings": g,
        "pair_ids": np.arange(args.rows, dtype=np.int64),
        "store": rng.standard_normal((args.rows, 64, 64, 256)).astype(np.float16) * 0.3,
    }

    def bench(mode: str, store_hbm: bool, batch: int = 1):
        out = Path(f"/tmp/serve_bench_{mode}_b{batch}")
        t0 = time.perf_counter()
        server = RetrievalServer(
            cfg, params, index, k=args.k,
            decode_dir=str(out), store_hbm=store_hbm,
        )
        # warm every power-of-two bucket up to `batch` (as cli/serve.py does):
        # a partial final batch (requests % batch != 0) rounds to a smaller
        # bucket and must not JIT-compile inside the timed region
        buckets = [1]
        while buckets[-1] < batch:
            buckets.append(buckets[-1] * 2)
        server.warmup(batch_buckets=buckets)
        startup = time.perf_counter() - t0
        lat, sizes = [], []
        for i in range(0, args.requests, batch):
            reqs = [{"id": f"{mode}{i + j}", "synthetic": i + j}
                    for j in range(min(batch, args.requests - i))]
            t0 = time.perf_counter()
            resps = server.handle_batch(reqs)
            for resp in resps:
                assert len(resp["masks"]) == args.k
            lat.append(time.perf_counter() - t0)
            sizes.append(len(reqs))
        lat = np.asarray(lat) * 1e3
        # per-request cost divides each batch's latency by ITS request count
        # (a trailing partial batch must not inflate throughput)
        per_req = lat / np.asarray(sizes)
        print(
            f"{mode:12s} B={batch:<2d} startup {startup:6.1f} s | batch latency "
            f"p50 {np.percentile(lat, 50):7.1f} ms  "
            f"p95 {np.percentile(lat, 95):7.1f} ms | per-request "
            f"{per_req.mean():7.1f} ms -> {1e3 / per_req.mean():6.1f} req/s  "
            f"(n={args.requests}, k={args.k})"
        )
        return lat

    bench("host-stream", store_hbm=False)
    bench("store-hbm", store_hbm=True)
    if args.batch > 1:
        # micro-batching A/B on the HBM-resident mode (the deployment mode):
        # one encode/scan/decode dispatch for B queued requests
        bench("store-hbm", store_hbm=True, batch=args.batch)


if __name__ == "__main__":
    main()
