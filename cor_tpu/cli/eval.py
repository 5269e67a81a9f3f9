"""Evaluation entry point.

Usage parity with the reference's my_test.py (which ships broken — it imports
a `val_metric` that no longer exists, my_test.py:12). Here both mask dumps and
per-sample CSV metrics work:

    python -m cor_tpu.cli.eval --config configs/vaild_config.yaml
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu evaluator")
    parser.add_argument("--config", required=True)
    parser.add_argument("--soft", action="store_true", help="also dump soft (grayscale) masks")
    parser.add_argument(
        "--visualize",
        type=int,
        default=0,
        metavar="N",
        help="also render N side-by-side comparison panels per split "
        "(query | GT | pred | support | support mask + caption), the working "
        "form of the reference's broken val_visual_for_compare_v2 import",
    )
    args = parser.parse_args(argv)

    # fail fast, not per-sample: the validator resizes every prediction with
    # cv2 (reference parity — vailder.py:468) inside a per-sample
    # try/continue, so a missing cv2 would otherwise skip EVERY sample and
    # exit 0 with an empty eval
    try:
        import cv2  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            "cor_tpu.cli.eval requires OpenCV (cv2) for reference-parity "
            f"mask resizing — pip install opencv-python-headless ({e})"
        )

    import jax

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.config import load_eval_config
    from cor_tpu.data.pipeline import get_valid_loader
    from cor_tpu.eval.validator import save_hard_pred_masks, save_soft_pred_masks, val_metric
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.train.checkpoint import restore_checkpoint
    from cor_tpu.train.step import make_predict_step
    from cor_tpu.utils.convert import (
        convert_core_checkpoint,
        load_torch_state_dict,
    )
    from cor_tpu.utils.meters import init_logger

    cfg = load_eval_config(args.config)
    core_cfg = cfg.core_config()
    logger = init_logger(Path(cfg.vaild_model_save_path) / "logs", "eval")

    if not cfg.tokenizer_path and cfg.load_checkpoint_path:
        logger.warning(
            "tokenizer_path is unset while evaluating a trained checkpoint: "
            "texts will be HASH-tokenized with ids unrelated to the trained "
            "vocab — set tokenizer_path to the SigLIP sentencepiece artifact."
        )

    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)
    if cfg.load_checkpoint_path:
        ckpt = Path(cfg.load_checkpoint_path)
        if ckpt.suffix in (".pth", ".pt", ".bin"):
            # trained CORE torch checkpoint (incl. DDP prefixes + audit,
            # reference: my_test.py:117-185)
            sd = load_torch_state_dict(str(ckpt))
            sig = core_cfg.support.siglip
            loaded = convert_core_checkpoint(
                sd,
                encoder_depth=core_cfg.encoder.depth,
                siglip_vision_depth=sig.vision.depth,
                siglip_text_depth=sig.text.depth,
                mask_pooling=cfg.mask_pooling,
            )
            from cor_tpu.utils.convert import audit_params

            audit = audit_params(params, loaded)
            for kind, keys in audit.items():
                if keys:
                    logger.info(f"[ckpt audit] {kind} ({len(keys)}): {keys[:10]}")
            params = loaded
            logger.info(f"Loaded torch CORE checkpoint: {ckpt}")
        else:
            restored = restore_checkpoint(ckpt.parent, ckpt.name, {"params": params})
            params = restored["params"]
            logger.info(f"Loaded Orbax checkpoint: {ckpt}")

    predict = make_predict_step(core_cfg)

    for split_name, csv_path in (("Test_1", cfg.val_csv_A), ("Test_2", cfg.val_csv_B)):
        if not csv_path:
            continue
        loader = get_valid_loader(cfg, csv_path=csv_path)
        out_dir = Path(cfg.vaild_model_save_path) / split_name
        # dump filenames are {pair_id}_{query_mask_name} exactly like the
        # reference (vailder.py:466-484) so offline Recall@K tooling keyed on
        # that convention matches; the loader is unshuffled/drop_last=False so
        # manifest row order == sample order
        mask_names = list(loader.dataset.df["Query_mask"].astype(str))
        written = save_hard_pred_masks(predict, params, loader, out_dir, mask_names=mask_names)
        logger.info(f"[{split_name}] wrote {len(written)} hard masks to {out_dir}")
        if args.soft:
            loader = get_valid_loader(cfg, csv_path=csv_path)
            save_soft_pred_masks(predict, params, loader, out_dir, mask_names=mask_names)
        if args.visualize > 0:
            from cor_tpu.eval.visualize import val_visual_for_compare

            loader = get_valid_loader(cfg, csv_path=csv_path)
            panels = val_visual_for_compare(
                predict,
                params,
                loader,
                out_dir,
                manifest=getattr(loader.dataset, "df", None),
                max_samples=args.visualize,
            )
            logger.info(f"[{split_name}] wrote {len(panels)} visualization panels")
        loader = get_valid_loader(cfg, csv_path=csv_path)
        summary = val_metric(
            predict,
            params,
            loader,
            out_dir / "val_metric.csv",
            manifest=getattr(loader.dataset, "df", None),
        )
        logger.info(
            f"[{split_name}] " + ", ".join(f"{k}={v:.4f}" for k, v in summary.items())
        )


if __name__ == "__main__":
    main()
