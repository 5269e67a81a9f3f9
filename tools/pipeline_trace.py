"""Capture an xplane trace of the full retrieval pipeline (bench geometry).

Runs bench.py's exact pipeline (encode + score + top-k + store-indexed
decode) for a few device-loop iterations under jax.profiler, then aggregate
with tools/xplane_agg.py <dir> <iters>.

Usage: python tools/pipeline_trace.py [--iters 3] [--trace /tmp/pipe_trace]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", default="/tmp/pipe_trace")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).parent.parent))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.models.core_model import CoreConfig, _cast, init_core_model
    from cor_tpu.models.prompt_encoder import get_dense_pe
    from cor_tpu.models.sam_decoder import mask_decoder
    from cor_tpu.models.support_branch import support_branch

    cfg = CoreConfig(
        sam_model="sam_base",
        siglip_model="ViT-B-16-SigLIP-384",
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )
    Q, K, G, STORE, CHUNK = 16, 64, 4096, 128, 128
    rng = np.random.default_rng(0)
    params = jax.device_put(_cast(init_core_model(jax.random.PRNGKey(0), cfg), jnp.bfloat16))
    gallery = jax.random.normal(jax.random.PRNGKey(3), (G, 256), jnp.float32)
    gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)
    cand_store = jax.random.normal(
        jax.random.PRNGKey(7), (STORE, 64, 64, 256), dtype=jnp.bfloat16
    ) + params["prompt_encoder"]["no_mask_embed"][0]
    support_img = jnp.asarray(rng.standard_normal((Q, 384, 384, 3), dtype=np.float32))
    text = jnp.asarray(rng.integers(2, 32000, (Q, 64)).astype(np.int32))
    support_mask = jnp.asarray((rng.random((Q, 384, 384, 1)) > 0.5).astype(np.float32))

    def pipeline(params, support_img, text, support_mask, gallery, cand_store):
        p = _cast(params, cfg.dtype)
        qfeat = support_branch(
            p["support_branch"], support_img.astype(cfg.dtype), text,
            support_mask.astype(cfg.dtype), cfg.support, train=False,
        )[:, 0, :]
        scores = jnp.dot(qfeat.astype(jnp.float32), gallery.T, preferred_element_type=jnp.float32)
        top_scores, top_idx = jax.lax.top_k(scores, K)
        flat_idx = top_idx.reshape(-1) % cand_store.shape[0]
        prompts = jnp.repeat(qfeat, K, axis=0)[:, None, :]
        image_pe = get_dense_pe(p["prompt_encoder"], cfg.prompt).astype(cfg.dtype)

        def decode_chunk(a):
            idx_c, prompts_c = a
            masks, iou, _ = mask_decoder(
                p["mask_decoder"], cand_store.astype(cfg.dtype), image_pe,
                prompts_c.astype(cfg.dtype), None, cfg.decoder,
                multimask_output=False, fused=True, store_idx=idx_c,
            )
            area = jnp.mean((masks > 0).astype(jnp.float32), axis=(1, 2, 3))
            return iou[:, 0], area, masks.astype(jnp.float32).sum()

        n_chunks = (Q * K) // CHUNK
        iou_flat, area_flat, mask_sums = jax.lax.map(
            decode_chunk,
            (flat_idx.reshape(n_chunks, CHUNK), prompts.reshape(n_chunks, CHUNK, 1, 256)),
        )
        return mask_sums.sum() + top_scores.sum() + area_flat.sum()

    iters = args.iters

    def pipeline_n(params, support_img, text, support_mask, gallery, cand_store):
        def body(carry, i):
            si = support_img + i.astype(jnp.float32) * 1e-6
            return carry + pipeline(params, si, text, support_mask, gallery, cand_store), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    fn = jax.jit(pipeline_n)
    a = (params, support_img, text, support_mask, gallery, cand_store)
    float(fn(*a))  # compile + warmup
    jax.profiler.start_trace(args.trace)
    float(fn(*a))
    jax.profiler.stop_trace()
    print(f"trace written to {args.trace} ({iters} iters)")


if __name__ == "__main__":
    main()
