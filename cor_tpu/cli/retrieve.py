"""Retrieval entry point: build a gallery index from (image, mask) candidates
and answer composed queries with top-k candidates + segmentation masks.

New capability relative to the reference (BASELINE.json north star). Demo
mode runs the full pipeline on synthetic data:

    python -m cor_tpu.cli.retrieve --config configs/vaild_config.yaml --demo
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu retrieval engine")
    parser.add_argument("--config", required=True)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--demo", action="store_true", help="synthetic gallery demo")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cor_tpu.config import load_eval_config
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import make_mesh
    from cor_tpu.retrieval.engine import RetrievalEngine
    from cor_tpu.retrieval.index import (
        make_candidate_encoder,
        make_candidate_mask_decoder,
        make_query_encoder,
    )

    cfg = load_eval_config(args.config)
    core_cfg = cfg.core_config()
    mesh = make_mesh()
    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)

    if not args.demo:
        raise SystemExit(
            "Gallery construction from a dataset manifest requires the COR127K "
            "data on disk; run with --demo for the synthetic pipeline."
        )

    rng = np.random.default_rng(0)
    n_cand, img = 16, core_cfg.encoder.img_size
    cand_imgs = rng.standard_normal((n_cand, img, img, 3)).astype(np.float32)
    cand_masks = (rng.random((n_cand, img, img, 1)) > 0.5).astype(np.float32)

    encode_cand = make_candidate_encoder(core_cfg)
    cand_emb, cand_img_emb = encode_cand(params, jnp.asarray(cand_imgs), jnp.asarray(cand_masks))

    engine = RetrievalEngine(mesh, k=min(args.k, n_cand))
    engine.set_gallery(np.asarray(cand_emb))

    s = core_cfg.support.siglip.vision.image_size
    q = 2
    encode_q = make_query_encoder(core_cfg)
    qfeat = encode_q(
        params,
        jnp.asarray(rng.standard_normal((q, s, s, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(2, core_cfg.support.siglip.text.vocab_size, (q, core_cfg.support.siglip.text.context_length)).astype(np.int32)),
        jnp.asarray((rng.random((q, s, s, 1)) > 0.5).astype(np.float32)),
    )
    scores, idx = engine.retrieve(qfeat)
    decode = make_candidate_mask_decoder(core_cfg)
    top1 = np.asarray(idx)[:, 0]
    masks = decode(params, jnp.asarray(np.asarray(cand_img_emb)[top1]), qfeat)
    print(
        json.dumps(
            {
                "queries": q,
                "gallery": n_cand,
                "topk_indices": np.asarray(idx).tolist(),
                "topk_scores": np.round(np.asarray(scores), 4).tolist(),
                "mask_shape": list(masks.shape),
            }
        )
    )


if __name__ == "__main__":
    main()
