"""Decode-only microbenchmark: the store-indexed mask decode of bench.py's
pipeline, isolated, with A/B-able two-way-layer kernel scheduling options.

The fused two-way layer kernel's measured per-step cost decomposes as
DMA(16 MB keys in+out per G=4 step at ~410 GB/s = 39 us) + compute (~22 us)
SERIAL — Mosaic does not overlap the next grid step's keys fetch with the
current step's body even though the steps are independent. This tool times
the decode chunk loop under the device-loop protocol for each scheduling
variant:

  python tools/decode_bench.py                 # baseline
  python tools/decode_bench.py --semantics parallel
  python tools/decode_bench.py --semantics arbitrary
  python tools/decode_bench.py --cost          # attach pl.CostEstimate
  python tools/decode_bench.py --semantics parallel --cost
  python tools/decode_bench.py --variant grid  # layer-as-grid-dim kernel
  python tools/decode_bench.py --variant stack # whole-stack kernel
  python tools/decode_bench.py --variant dma   # manual double-buffered DMA

Prints ms/128-candidate chunk and candidates/sec (decode only).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--semantics", choices=["parallel", "arbitrary"], default=None)
    ap.add_argument("--cost", action="store_true")
    ap.add_argument(
        "--variant", choices=["layer", "grid", "stack", "dma"], default="layer"
    )
    ap.add_argument(
        "--int8", action="store_true",
        help="int8 per-row-quantized candidate store (in-kernel dequant)",
    )
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--store", type=int, default=128)
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.ops.pallas import two_way_layer as twl

    if args.semantics:
        twl.KERNEL_OPTS["dimension_semantics"] = (args.semantics,)
    twl.KERNEL_OPTS["cost_estimate"] = bool(args.cost)

    from cor_tpu.models.core_model import CoreConfig, _cast, init_core_model
    from cor_tpu.models.prompt_encoder import get_dense_pe
    from cor_tpu.models.sam_decoder import mask_decoder
    import cor_tpu.models.sam_decoder as sd

    sd.GRID_FUSED = args.variant == "grid"
    sd.STACK_FUSED = args.variant == "stack"
    sd.DMA_FUSED = args.variant == "dma"

    cfg = CoreConfig(
        sam_model="sam_base",
        siglip_model="ViT-B-16-SigLIP-384",
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )
    CHUNK, STORE = 128, args.store
    n_chunks = args.chunks

    params = jax.device_put(_cast(init_core_model(jax.random.PRNGKey(0), cfg), jnp.bfloat16))
    raw_store = jax.random.normal(
        jax.random.PRNGKey(7), (STORE, 64, 64, 256), dtype=jnp.bfloat16
    )
    no_mask = params["prompt_encoder"]["no_mask_embed"][0]
    store_scales = None
    if args.int8:
        from cor_tpu.retrieval.engine import quantize_candidate_store

        cand_store, store_scales = jax.jit(quantize_candidate_store)(raw_store, no_mask)
    else:
        cand_store = raw_store + no_mask
    rng = np.random.default_rng(0)
    flat_idx = jnp.asarray(rng.integers(0, STORE, (n_chunks, CHUNK)).astype(np.int32))
    prompts = jnp.asarray(
        rng.standard_normal((n_chunks, CHUNK, 1, 256), dtype=np.float32), dtype=jnp.bfloat16
    )

    def decode_all(params, flat_idx, prompts, cand_store):
        p = _cast(params, cfg.dtype)
        image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cfg.dtype)

        store_arg = cand_store if args.int8 else cand_store.astype(cfg.dtype)

        def decode_chunk(args_):
            idx_c, prompts_c = args_
            masks, iou, _ = mask_decoder(
                p["mask_decoder"], store_arg, image_pe,
                prompts_c.astype(cfg.dtype), None, cfg.decoder,
                multimask_output=False, fused=True, store_idx=idx_c,
                store_scale=store_scales,
            )
            area = jnp.mean((masks > 0).astype(jnp.float32), axis=(1, 2, 3))
            return iou[:, 0], area, masks.astype(jnp.float32).sum()

        iou_f, area_f, sums = jax.lax.map(decode_chunk, (flat_idx, prompts))
        return sums.sum() + iou_f.sum() + area_f.sum()

    iters = args.iters

    def decode_n(params, flat_idx, prompts, cand_store):
        def body(carry, i):
            pr = prompts + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
            return carry + decode_all(params, flat_idx, pr, cand_store), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(decode_n)
    a = (params, flat_idx, prompts, cand_store)
    float(fn(*a))  # compile + warmup
    t0 = time.perf_counter()
    float(fn(*a))
    dt = time.perf_counter() - t0

    total_cands = n_chunks * CHUNK * iters
    ms_per_chunk = dt / (n_chunks * iters) * 1e3
    print(
        f"variant={args.variant} semantics={args.semantics} cost={args.cost} "
        f"int8={args.int8} store={STORE}: "
        f"{ms_per_chunk:.3f} ms/{CHUNK}-cand chunk, "
        f"{total_cands / dt:,.0f} candidates/sec (decode only)"
    )


if __name__ == "__main__":
    main()
