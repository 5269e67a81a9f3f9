"""Isolated SAM ViT encoder benchmark + optional xplane trace (real TPU).

The SAM image encoder dominates the train step's FLOPs (12 ViT-B blocks over
4096 tokens — reference: lib/sam_model/image_encoder.py:17-119) and the
retrieval protocol's candidate-encode stage. This times ONLY
``sam_encoder`` at flagship geometry with the honest device-side lax.scan
protocol (per-iteration input perturbation defeats CSE/LICM), reports an
MXU-efficiency estimate against the analytic forward FLOPs, and optionally
captures a jax.profiler trace for tools/xplane_agg.py.

Usage: python tools/sam_trace.py [--model sam_base|sam_large|sam_huge]
       [--b 1] [--iters 30] [--trace DIR]
       [--no-fused] (XLA attention instead of the Pallas rel-pos kernel)

sam_large (head_dim 64) runs the fused rel-pos kernel like sam_base;
sam_huge (head_dim 80: 128 % head_dim != 0) runs it through the lane-pad
shim (cor_tpu/ops/attention.py — each head zero-padded to 128 lanes,
measured 66.4 ms/image at 45% MXU vs 197.4 at 15% for the XLA fallback,
BASELINE.md). Pass --no-fused to measure the XLA formulation instead.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def encoder_forward_flops(cfg, B: int) -> float:
    """Analytic forward FLOPs (2*MAC) of the SAM ViT encoder."""
    g = cfg.grid  # 64
    n_global = g * g
    w = cfg.window_size
    gp = (g + w - 1) // w * w  # padded grid (70)
    n_win_tokens = gp * gp  # 4900 padded tokens in windowed blocks
    d, mlp = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    flops = 0.0
    for i in range(cfg.depth):
        if i in cfg.global_attn_indexes:
            n_proj = n_attn = n_global
        else:
            n_proj, n_attn = n_win_tokens, n_win_tokens
        flops += 2 * (4 * n_proj * d * d)  # qkv + out proj
        flops += 2 * (2 * n_attn * (w * w if i not in cfg.global_attn_indexes else n_global) * d)
        flops += 2 * (8 * n_global * d * d)  # MLP on unpadded tokens
    # patch embed + neck
    flops += 2 * (n_global * cfg.patch_size**2 * cfg.in_chans * d)
    flops += 2 * (n_global * d * cfg.out_chans + n_global * 9 * cfg.out_chans**2)
    return flops * B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", default="sam_base",
        choices=("sam_base", "sam_large", "sam_huge"),
    )
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--window-in-kernel", action="store_true",
                    help="fused_window_indexing=True: fold the window "
                         "partition into the kernel's block index maps "
                         "(measured SLOWER on sam_base — negative result #5; "
                         "flag kept for per-size re-measurement)")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.models.sam_encoder import (
        init_sam_encoder,
        sam_encoder,
        sam_encoder_config,
    )

    cfg = sam_encoder_config(
        args.model,
        fused_attention=not args.no_fused,
        remat_blocks=not args.no_remat,
        fused_window_indexing=args.window_in_kernel,
    )
    B, iters = args.b, args.iters
    rng = np.random.default_rng(0)
    params = jax.device_put(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_sam_encoder(jax.random.PRNGKey(0), cfg))
    )
    img = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)).astype(np.float32))

    def encode_n(params, img):
        def body(carry, i):
            x = (img + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)  # defeat CSE
            emb = sam_encoder(params, x, cfg)
            return carry + emb.astype(jnp.float32).sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(encode_n)
    float(fn(params, img))  # compile + warmup
    t0 = time.perf_counter()
    float(fn(params, img))
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    fl = encoder_forward_flops(cfg, B)
    print(json.dumps({
        "model": args.model,
        "sam_encoder_ms_per_iter": round(ms, 3),
        "batch": B,
        "images_per_sec": round(B * iters / dt, 1),
        "analytic_tflop_per_iter": round(fl / 1e12, 3),
        "mxu_efficiency_vs_197tflops": round(fl / (dt / iters) / 197e12, 3),
        "fused_attention": cfg.fused_attention,
    }))

    if args.trace:
        jax.profiler.start_trace(args.trace)
        float(fn(params, img))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
