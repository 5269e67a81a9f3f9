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
        "--limit",
        type=int,
        default=0,
        metavar="N",
        help="evaluate only the first N manifest rows per split (debug "
        "truncation — the reference keeps this as commented-out lines, "
        "dataloader.py:89,257)",
    )
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
    from cor_tpu.eval.validator import run_eval_split
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.train.step import make_predict_step
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
        from cor_tpu.utils.convert import load_trained_params

        # one shared loader for every inference CLI: torch CORE .pth (DDP
        # prefixes + audit) or ANY trainer-written Orbax layout (params-only
        # best_model, full checkpoint_epoch_N / best_model_full /
        # interrupted_* — a params-only template would reject the full ones)
        params = load_trained_params(
            cfg.load_checkpoint_path, core_cfg, params, logger, cfg.mask_pooling
        )

    predict = make_predict_step(core_cfg)

    for split_name, csv_path in (("Test_1", cfg.val_csv_A), ("Test_2", cfg.val_csv_B)):
        if not csv_path:
            continue
        loader = get_valid_loader(cfg, csv_path=csv_path, limit=args.limit or None)
        out_dir = Path(cfg.vaild_model_save_path) / split_name
        # dump filenames are {pair_id}_{query_mask_name} exactly like the
        # reference (vailder.py:466-484) so offline Recall@K tooling keyed on
        # that convention matches; the loader is unshuffled/drop_last=False so
        # manifest row order == sample order
        mask_names = list(loader.dataset.df["Query_mask"].astype(str))
        # ONE forward pass over the split feeds every consumer (hard/soft
        # dumps, metric CSV, panels) — the SAM-encoder forward dominates eval
        # wall time, so separate passes cost up to 4x the device time
        result = run_eval_split(
            predict,
            params,
            loader,
            out_dir,
            manifest=getattr(loader.dataset, "df", None),
            mask_names=mask_names,
            soft=args.soft,
            visualize_n=args.visualize,
        )
        logger.info(f"[{split_name}] wrote {len(result['hard'])} hard masks to {out_dir}")
        if args.soft:
            logger.info(f"[{split_name}] wrote {len(result['soft'])} soft masks")
        if args.visualize > 0:
            logger.info(
                f"[{split_name}] wrote {len(result['panels'])} visualization panels"
            )
        logger.info(
            f"[{split_name}] "
            + ", ".join(f"{k}={v:.4f}" for k, v in result["summary"].items())
        )


if __name__ == "__main__":
    main()
