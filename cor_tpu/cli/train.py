"""Training entry point.

Usage parity with the reference (reference: my_train_a.py; README.md:143-147):

    python -m cor_tpu.cli.train --config configs/train_config_m3.yaml

The accelerate-launcher YAML has no equivalent: process topology comes from
the JAX runtime (all visible devices form the data mesh) and mixed precision
from `compute_dtype` in the one experiment config.
"""

from __future__ import annotations

import argparse
import os
import random
from pathlib import Path

import numpy as np


def set_random_seed(seed: int):
    """Seed python/numpy (reference: my_train_a.py:43-52); JAX keys are
    explicit so determinism is structural."""
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    parser = argparse.ArgumentParser(description="cor_tpu trainer")
    parser.add_argument("--config", required=True, help="experiment YAML")
    parser.add_argument("--synthetic", action="store_true", help="train on synthetic data (smoke mode)")
    parser.add_argument(
        "--profile",
        type=int,
        default=0,
        metavar="N",
        help="capture a jax.profiler trace of the first N train steps "
        "(written under {train_model_save_path}/profile)",
    )
    args = parser.parse_args(argv)

    import jax

    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from cor_tpu.config import load_train_config
    from cor_tpu.data.pipeline import DataLoader, SyntheticDataset, get_train_loader, get_valid_loader
    from cor_tpu.models.core_model import init_core_model
    from cor_tpu.train.checkpoint import resolve_resume
    from cor_tpu.train.optim import count_params, make_optimizer, trainable_mask
    from cor_tpu.train.step import create_train_state
    from cor_tpu.train.trainer import Trainer
    from cor_tpu.utils.convert import load_sam_weights, load_siglip_weights
    from cor_tpu.utils.meters import init_logger

    cfg = load_train_config(args.config)
    set_random_seed(cfg.seed)
    core_cfg = cfg.core_config()

    logger = init_logger(Path(cfg.train_model_save_path) / "logs", "train")
    logger.info(f"devices: {jax.devices()}")

    # path validation (fail fast — reference: my_train_a.py:93-103)
    if not args.synthetic:
        for p in (cfg.dataset_path, cfg.train_csv, cfg.val_csv):
            if not p or not Path(p).exists():
                raise FileNotFoundError(f"Required data path missing: {p!r}")
        if not cfg.tokenizer_path and (
            cfg.load_siglip_pretrained_checkpoint or cfg.load_checkpoint_path
        ):
            logger.warning(
                "tokenizer_path is unset while pretrained SigLIP/CORE weights are "
                "configured: texts will be HASH-tokenized with ids unrelated to "
                "the trained vocab — change-text conditioning will be garbage. "
                "Set tokenizer_path to the SigLIP sentencepiece artifact "
                "(reference tokenizes via open_clip — utils/dataloader.py:128)."
            )

    params = init_core_model(jax.random.PRNGKey(cfg.seed), core_cfg)
    if cfg.load_sam_pretrained_checkpoint:
        params = load_sam_weights(
            params, cfg.load_sam_pretrained_checkpoint, core_cfg.encoder.depth
        )
        logger.info(f"Loaded SAM weights: {cfg.load_sam_pretrained_checkpoint}")
    if cfg.load_siglip_pretrained_checkpoint:
        sig = core_cfg.support.siglip
        params = load_siglip_weights(
            params, cfg.load_siglip_pretrained_checkpoint, sig.vision.depth, sig.text.depth
        )
        logger.info(f"Loaded SigLIP weights: {cfg.load_siglip_pretrained_checkpoint}")

    tx, schedule = make_optimizer(
        params, cfg.optimizer, cfg.lr, cfg.lr_scheduler, cfg.epoch, cfg.gradient_clip,
        freeze_towers=cfg.freeze_towers,
        lr_decay_rate=cfg.lr_decay_rate, lr_decay_epoch=cfg.lr_decay_epoch,
    )
    mask = trainable_mask(params, cfg.freeze_towers)
    logger.info(
        f"params: {count_params(params):,} total, {count_params(params, mask):,} trainable"
    )
    state = create_train_state(params, tx)

    state, start_epoch, best_resume = resolve_resume(cfg, state, logger)

    if args.synthetic:
        train_ds = SyntheticDataset(length=4 * cfg.batch_size, seed=cfg.seed, train=True)
        val_ds = SyntheticDataset(length=2 * cfg.batch_size, seed=cfg.seed + 1)
        train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True, drop_last=True, num_workers=cfg.num_workers)
        val_loader = DataLoader(val_ds, cfg.batch_size, num_workers=cfg.num_workers)
    else:
        train_loader = get_train_loader(cfg)
        val_loader = get_valid_loader(cfg)

    from cor_tpu.utils.observability import SummaryWriter

    writer = SummaryWriter(Path(cfg.train_model_save_path) / "tb")
    trainer = Trainer(
        cfg,
        state,
        tx,
        schedule,
        logger,
        writer=writer,
        profile_steps=args.profile,
        profile_dir=Path(cfg.train_model_save_path) / "profile",
    )
    if best_resume is not None:
        # a resumed run must not clobber best_model with a worse epoch
        trainer.best.best_score = best_resume["best_score"]
        trainer.best.best_epoch = best_resume["best_epoch"]
    best = trainer.fit(train_loader, val_loader, start_epoch=start_epoch)
    writer.close()
    logger.info(
        f"Best epoch {best.best_epoch}: "
        + ", ".join(f"{k}={v:.4f}" for k, v in best.best_metrics.items())
    )


if __name__ == "__main__":
    main()
