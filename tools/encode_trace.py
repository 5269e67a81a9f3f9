"""Isolated encode-stage benchmark + optional xplane trace (real TPU).

Times ONLY the query-encode stage of the retrieval pipeline (support branch:
SigLIP vision+text towers + mask-adapter pooling + fusion + projection) at
the bench geometry (Q=16), with the same honest device-side lax.scan
protocol as bench.py. Use --trace DIR to capture a jax.profiler trace of a
few iterations, then aggregate with tools/xplane_agg.py.

Usage: python tools/encode_trace.py [--iters 50] [--trace /tmp/enc_trace]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--q", type=int, default=16)
    ap.add_argument(
        "--model", default="ViT-B-16-SigLIP-384",
        help="SigLIP tower (any cor_tpu.models.siglip.SIGLIP_MODELS key, "
        "e.g. ViT-SO400M-14-SigLIP-384 for the largest reference tower)",
    )
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.models.core_model import CoreConfig, _cast, init_core_model
    from cor_tpu.models.support_branch import support_branch

    cfg = CoreConfig(
        sam_model="sam_base",
        siglip_model=args.model,
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )
    Q = args.q
    rng = np.random.default_rng(0)
    params = jax.device_put(
        _cast(init_core_model(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    )
    support_img = jnp.asarray(rng.standard_normal((Q, 384, 384, 3), dtype=np.float32))
    text = jnp.asarray(rng.integers(2, 32000, (Q, 64)).astype(np.int32))
    support_mask = jnp.asarray((rng.random((Q, 384, 384, 1)) > 0.5).astype(np.float32))

    iters = args.iters

    def encode_n(params, support_img, text, support_mask):
        p = _cast(params, cfg.dtype)["support_branch"]

        def body(carry, i):
            si = support_img + i.astype(jnp.float32) * 1e-6  # defeat CSE
            qf = support_branch(
                p, si.astype(cfg.dtype), text, support_mask.astype(cfg.dtype),
                cfg.support, train=False,
            )[:, 0, :]
            return carry + qf.astype(jnp.float32).sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(encode_n)
    a = (params, support_img, text, support_mask)
    float(fn(*a))  # compile + warmup
    t0 = time.perf_counter()
    float(fn(*a))
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    print(json.dumps({
        "model": args.model,
        "encode_ms_per_iter": round(ms, 3),
        "queries_per_iter": Q,
        "encodes_per_sec": round(Q * iters / dt, 1),
    }))

    if args.trace:
        jax.profiler.start_trace(args.trace)
        float(fn(*a))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
