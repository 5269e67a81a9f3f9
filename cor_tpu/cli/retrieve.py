"""Retrieval entry point: end-to-end Recall@K over a triplet manifest, plus
top-k candidate masks for inspection.

New capability relative to the reference (BASELINE.json north star). The
protocol (cor_tpu.retrieval.protocol): every triplet's (query image, query
mask) is a gallery candidate, every triplet's (support image, support mask,
change text) is a query, and query i's target is gallery row i — Recall@K is
measured end-to-end through the sharded gallery scan.

    # real manifest (COR127K on disk):
    python -m cor_tpu.cli.retrieve --config configs/vaild_config.yaml

    # synthetic triplets (no data needed — same code path):
    python -m cor_tpu.cli.retrieve --config configs/vaild_config.yaml --synthetic 32
"""

from __future__ import annotations

import argparse
import logging
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu retrieval engine")
    parser.add_argument("--config", required=True)
    parser.add_argument("--k", type=int, default=10, help="max K for Recall@K")
    parser.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="run the protocol on N synthetic triplets instead of the manifest",
    )
    parser.add_argument("--batch-size", type=int, default=0, help="override config batch size")
    parser.add_argument(
        "--limit",
        type=int,
        default=0,
        metavar="N",
        help="run the protocol on only the first N manifest rows (debug "
        "truncation — the reference keeps this as commented-out lines, "
        "dataloader.py:89,257); ignored with --synthetic",
    )
    parser.add_argument(
        "--rerank", action="store_true",
        help="decode-reranked protocol: each chip mask-decodes its local "
             "top-k from a mesh-sharded int8 store of the candidates' SAM "
             "embeddings; the merge ranks by predicted mask IoU "
             "(k candidates decoded per query per chip)",
    )
    parser.add_argument(
        "--approx", action="store_true",
        help="approx_max_k first-stage scan (recall_target 0.99)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="int8 per-row-quantized first-stage gallery scan",
    )
    parser.add_argument(
        "--rescore", action="store_true",
        help="two-stage retrieval: the device scan selects a 4x-widened "
             "candidate pool, then the pool is re-scored EXACTLY in fp32 on "
             "host and re-top-k'd — recovers the --approx/--int8 ranking "
             "loss (accuracy matrix in BASELINE.md). Mutually exclusive "
             "with --rerank, which ranks by decoded mask IoU instead",
    )
    parser.add_argument(
        "--rescore-width", type=int, default=4, metavar="W",
        help="first-stage pool width multiplier for --rescore (pool = W*k)",
    )
    parser.add_argument(
        "--recall-target", type=float, default=None, metavar="R",
        help="approx_max_k recall target for --approx (default 0.99; with "
             "--rescore 0.999 — the two-stage residual is first-stage pool "
             "misses, and the tighter target closes it for ~free)",
    )
    parser.add_argument(
        "--gallery-index",
        default=None,
        metavar="DIR",
        help="serve against a prebuilt cor_tpu.cli.index artifact instead of "
        "re-encoding the gallery (queries still encoded live)",
    )
    parser.add_argument(
        "--dump-top1",
        action="store_true",
        help="also decode + report the top-1 candidate mask shape per query",
    )
    args = parser.parse_args(argv)
    if args.rerank and args.rescore:
        # the decode-reranked protocol replaces the scan's ranking with
        # predicted-mask IoU, so the exact-fp32 second stage never runs —
        # reporting "rescore" numbers that are really rerank-only misleads
        # (advisor r4): refuse instead of silently ignoring one flag
        parser.error(
            "--rerank and --rescore are mutually exclusive: rerank ranks by "
            "decoded mask IoU (the embedding-score rescore stage does not "
            "apply). Run them separately to compare protocols."
        )

    import jax
    import jax.numpy as jnp

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.config import load_eval_config
    from cor_tpu.data.pipeline import CORDataset, DataLoader, SyntheticDataset
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.parallel import make_mesh
    from cor_tpu.retrieval.protocol import (
        evaluate_retrieval,
        evaluate_retrieval_with_index,
    )
    from cor_tpu.utils.convert import load_sam_weights, load_siglip_weights

    cfg = load_eval_config(args.config)
    core_cfg = cfg.core_config()
    mesh = make_mesh()
    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)
    if cfg.load_sam_pretrained_checkpoint:
        params = load_sam_weights(
            params, cfg.load_sam_pretrained_checkpoint, core_cfg.encoder.depth
        )
    if cfg.load_siglip_pretrained_checkpoint:
        sig = core_cfg.support.siglip
        params = load_siglip_weights(
            params, cfg.load_siglip_pretrained_checkpoint, sig.vision.depth, sig.text.depth
        )
    if cfg.load_checkpoint_path:
        from cor_tpu.utils.convert import load_trained_params

        # trained CORE weights (torch .pth or any Orbax training layout) —
        # without this the retrieval protocol would silently use untrained fusion/
        # decoder weights while the config promises a trained model
        params = load_trained_params(
            cfg.load_checkpoint_path, core_cfg, params,
            logging.getLogger("cor_tpu.retrieve"), cfg.mask_pooling,
        )

    batch_size = args.batch_size or cfg.batch_size
    if (
        not args.synthetic
        and not cfg.tokenizer_path
        and (cfg.load_siglip_pretrained_checkpoint or cfg.load_checkpoint_path)
    ):
        logging.getLogger("cor_tpu.retrieve").warning(
            "tokenizer_path is unset while pretrained weights are configured: "
            "manifest texts will be HASH-tokenized with ids unrelated to the "
            "trained vocab — reported recall would be meaningless. Set "
            "tokenizer_path to the SigLIP sentencepiece artifact."
        )
    if args.synthetic:
        ds = SyntheticDataset(
            length=args.synthetic,
            query_img_size=core_cfg.encoder.img_size,
            support_img_size=core_cfg.support.siglip.vision.image_size,
            context_length=core_cfg.support.siglip.text.context_length,
            vocab_size=core_cfg.support.siglip.text.vocab_size,
            seed=cfg.seed,
        )
    else:
        csv_path = cfg.val_csv_A or cfg.val_csv_B
        if not csv_path or not Path(csv_path).exists():
            raise SystemExit(
                f"Manifest {csv_path!r} not found; pass --synthetic N to run "
                "the protocol on synthetic triplets."
            )
        ds = CORDataset(
            csv_path=csv_path,
            dataset_path=cfg.dataset_path,
            train=False,
            tokenizer_path=cfg.tokenizer_path,
            limit=args.limit or None,
        )
    loader = DataLoader(ds, batch_size, num_workers=cfg.num_workers)

    # the user's --k cutoff is always reported (plus the standard 1/5/10
    # below it) — filtering to a hardcoded set silently dropped e.g. --k 3
    ks = tuple(sorted({k for k in (1, 5, 10) if k < args.k} | {args.k}))
    if args.gallery_index:
        from cor_tpu.retrieval.index import load_gallery_index

        index = load_gallery_index(args.gallery_index)
        if args.rerank and index.get("store") is None:
            raise SystemExit(
                "--rerank needs the SAM image-embedding store in the gallery "
                "index — rebuild it with `cor_tpu.cli.index --with-store`"
            )
        result = evaluate_retrieval_with_index(
            core_cfg, params, loader, mesh, index, ks=ks, rerank=args.rerank,
            approx=args.approx, quantize=args.int8, rescore=args.rescore,
            rescore_width=args.rescore_width, recall_target=args.recall_target,
        )
    else:
        result = evaluate_retrieval(
            core_cfg, params, loader, mesh, ks=ks, rerank=args.rerank,
            approx=args.approx, quantize=args.int8, rescore=args.rescore,
            rescore_width=args.rescore_width, recall_target=args.recall_target,
        )

    if args.dump_top1:
        from cor_tpu.retrieval.engine import RetrievalEngine
        from cor_tpu.retrieval.index import make_candidate_encoder, make_candidate_mask_decoder

        # re-encode a small head of the dataset for the decode demo
        head = [ds[i] for i in range(min(4, len(ds)))]
        batch = {k: np.stack([s[k] for s in head]) for k in head[0] if k != "query_mask_path"}
        encode_cand = make_candidate_encoder(core_cfg)
        emb, img_emb = encode_cand(
            params, jnp.asarray(batch["query_img"]), jnp.asarray(batch["query_mask"])
        )
        decode = make_candidate_mask_decoder(core_cfg)
        masks = decode(params, img_emb, emb)
        result["top1_mask_shape"] = list(np.asarray(masks).shape)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in result.items()}))


if __name__ == "__main__":
    main()
