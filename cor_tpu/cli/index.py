"""Gallery-index builder: encode a manifest's candidates once, serve forever.

Serving-side half of the retrieval engine (new capability — the reference
has no gallery scan at all, SURVEY.md §0): one pass of the SAM encoder +
masked pooling over every (query image, query GT mask) candidate of a
triplet manifest, written as an on-disk artifact that
``cor_tpu.cli.retrieve --gallery-index`` loads instead of re-encoding the
gallery per run.

    # real manifest:
    python -m cor_tpu.cli.index --config configs/vaild_config.yaml --out /data/cor_index

    # synthetic smoke (same code path):
    python -m cor_tpu.cli.index --config configs/vaild_config.yaml --out /tmp/idx --synthetic 8

``--with-store`` additionally saves the [G, g, g, C] SAM image embeddings
(fp16) so retrieval can mask-decode candidates without their source images.
Size warning: ~4 MB per candidate at flagship geometry — intended for
serving shards, not a full 127K dump.
"""

from __future__ import annotations

import argparse
import logging
import json
from pathlib import Path

import numpy as np


def build_index(core_cfg, params, loader, with_store: bool = False):
    """Alias of cor_tpu.retrieval.index.build_gallery (the one canonical
    gallery-encoding loop)."""
    from cor_tpu.retrieval.index import build_gallery

    return build_gallery(core_cfg, params, loader, with_store=with_store)


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu gallery index builder")
    parser.add_argument("--config", required=True)
    parser.add_argument("--out", required=True, help="output artifact directory")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N")
    parser.add_argument("--batch-size", type=int, default=0)
    parser.add_argument(
        "--limit",
        type=int,
        default=0,
        metavar="N",
        help="index only the first N manifest rows (debug truncation); "
        "ignored with --synthetic",
    )
    parser.add_argument(
        "--with-store",
        action="store_true",
        help="also save SAM image embeddings for image-free candidate decode",
    )
    args = parser.parse_args(argv)

    import jax

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.config import load_eval_config
    from cor_tpu.data.pipeline import CORDataset, DataLoader, SyntheticDataset
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.retrieval.index import save_gallery_index
    from cor_tpu.utils.convert import load_sam_weights

    cfg = load_eval_config(args.config)
    core_cfg = cfg.core_config()
    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)
    if cfg.load_sam_pretrained_checkpoint:
        params = load_sam_weights(
            params, cfg.load_sam_pretrained_checkpoint, core_cfg.encoder.depth
        )
    if cfg.load_checkpoint_path:
        from cor_tpu.utils.convert import load_trained_params

        # trained CORE weights (torch .pth or any Orbax training layout) —
        # without this the index builder would silently use untrained fusion/
        # decoder weights while the config promises a trained model
        params = load_trained_params(
            cfg.load_checkpoint_path, core_cfg, params,
            logging.getLogger("cor_tpu.index"), cfg.mask_pooling,
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
                f"Manifest {csv_path!r} not found; pass --synthetic N to build "
                "a synthetic index."
            )
        ds = CORDataset(
            csv_path=csv_path,
            dataset_path=cfg.dataset_path,
            train=False,
            tokenizer_path=cfg.tokenizer_path,
            limit=args.limit or None,
        )
    loader = DataLoader(ds, args.batch_size or cfg.batch_size, num_workers=cfg.num_workers)

    emb, ids, store = build_index(core_cfg, params, loader, with_store=args.with_store)
    save_gallery_index(args.out, emb, ids, image_embeddings=store)
    print(
        json.dumps(
            {
                "rows": int(emb.shape[0]),
                "dim": int(emb.shape[1]),
                "with_store": bool(args.with_store),
                "out": str(args.out),
            }
        )
    )


if __name__ == "__main__":
    main()
