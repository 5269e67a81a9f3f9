"""Typed experiment configuration.

Replaces the reference's flat YAML -> argparse.Namespace loading
(reference: my_train_a.py:24-28) with validating dataclasses; YAML files with
the reference's exact key names (config/train_config/train_config_m3.yaml,
config/vaild_config/vaild_config.yaml) load directly — unknown keys raise
instead of being silently ignored.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import yaml

from cor_tpu.models.core_model import CoreConfig


@dataclass
class TrainConfig:
    # experiment
    epoch: int = 15
    lr: float = 1.0e-4
    lr_scheduler: str = "None"
    batch_size: int = 10
    optimizer: str = "AdamW"
    lr_decay_rate: float = 0.1
    lr_decay_epoch: int = 50
    gradient_clip: float = 0.5
    train_model_save_epoch: int = 5
    batch_record_interval: int = 10
    multimask_output: bool = False
    seed: int = 42

    # model
    sam_model_name: str = "sam_base"
    siglip_model_name: str = "ViT-B-16-SigLIP-384"
    mask_pooling: str = "MaskAdapterPooling"

    # paths
    dataset_path: str = ""
    train_csv: str = ""
    val_csv: str = ""
    train_model_save_path: str = "./checkpoints"
    load_sam_pretrained_checkpoint: Optional[str] = None
    load_siglip_pretrained_checkpoint: Optional[str] = None
    load_checkpoint_path: Optional[str] = None
    # SigLIP sentencepiece tokenizer artifact (HF directory or vocab file);
    # None -> deterministic hash fallback (fine for synthetic/smoke runs,
    # garbage with pretrained SigLIP weights — the CLIs warn loudly)
    tokenizer_path: Optional[str] = None

    # runtime (cor_tpu additions)
    compute_dtype: str = "bfloat16"
    # False = full fine-tune: the reference-frozen towers (SigLIP, image
    # encoder, IoU head) also receive gradients/updates
    freeze_towers: bool = True
    # None keeps the model default (per-block remat ON — free when the
    # encoder is frozen, its output is stop_gradient'ed). For UNFROZEN
    # fine-tunes remat re-runs every encoder block in the backward; False
    # trades HBM for FLOPs (measured −16% step time at B=4 on v5e, fits
    # memory there — verify at your batch size)
    encoder_remat: Optional[bool] = None
    num_workers: int = 8
    mesh_data: Optional[int] = None  # None -> all devices
    mesh_model: int = 1
    # GPipe pipeline parallelism: > 1 adds a `stage` mesh axis and runs the
    # SAM encoder's block stack as mesh_stage pipeline stages (fully
    # differentiable — the train step pipelines too; gradient parity vs the
    # sequential step is pinned in tests/test_pipeline_parallel.py).
    # Composes with mesh_data (devices = data x model x stage)
    mesh_stage: int = 1
    # microbatches per pipeline fill (bubble fraction = (S-1)/(M+S-1));
    # batch_size must divide by it after mesh padding
    pp_microbatches: int = 4
    log_every: int = 10
    # ZeRO-1 analog: shard optimizer-state leaves over the data axis
    # (the reference's DeepSpeed option — my_train_a.py:208-213)
    shard_optimizer_state: bool = False
    # >1: split each batch into this many microbatches and accumulate their
    # gradients under one lax.scan before a single optimizer update — only
    # one microbatch's activations live at a time, so unfrozen fine-tunes
    # reach large effective batches within HBM (the reference has no
    # equivalent; it always steps per loader batch, trainer_v3_g.py:21-97)
    grad_accum: int = 1
    # True: Orbax async checkpointing — the directory write overlaps the
    # next training steps instead of blocking the loop (the reference
    # blocks on torch.save); emergency/interrupt saves always drain
    async_checkpoint: bool = False
    # Sequence parallelism for the SAM encoder over the mesh's `model` axis
    # (Megatron-SP): token-axis activation sharding between blocks. Only
    # meaningful with mesh_model > 1; placement-only, numerics unchanged
    seq_shard: bool = False

    def core_config(self) -> CoreConfig:
        cfg = CoreConfig(
            sam_model=self.sam_model_name,
            siglip_model=self.siglip_model_name,
            mask_pooling=self.mask_pooling,
            multimask_output=self.multimask_output,
            compute_dtype=self.compute_dtype,
            freeze_towers=self.freeze_towers,
        )
        if self.encoder_remat is not None or self.seq_shard or self.mesh_stage > 1:
            from dataclasses import replace as _replace

            enc = cfg.encoder
            if self.encoder_remat is not None:
                enc = _replace(enc, remat_blocks=self.encoder_remat)
            if self.seq_shard:
                enc = _replace(enc, seq_shard=True)
            if self.mesh_stage > 1:
                enc = _replace(
                    enc,
                    pp_stages=self.mesh_stage,
                    pp_microbatches=self.pp_microbatches,
                )
            cfg = _replace(cfg, encoder_override=enc)
        return cfg


@dataclass
class EvalConfig:
    batch_size: int = 10
    sam_model_name: str = "sam_base"
    siglip_model_name: str = "ViT-B-16-SigLIP-384"
    mask_pooling: str = "MaskAdapterPooling"
    multimask_output: bool = False
    compute_dtype: str = "bfloat16"
    seed: int = 0

    dataset_path: str = ""
    train_csv: str = ""
    val_csv_A: str = ""
    val_csv_B: str = ""
    vaild_model_save_path: str = "./eval_out"
    load_checkpoint_path: Optional[str] = None
    load_sam_pretrained_checkpoint: Optional[str] = None
    load_siglip_pretrained_checkpoint: Optional[str] = None
    tokenizer_path: Optional[str] = None
    num_workers: int = 8

    def core_config(self) -> CoreConfig:
        return CoreConfig(
            sam_model=self.sam_model_name,
            siglip_model=self.siglip_model_name,
            mask_pooling=self.mask_pooling,
            multimask_output=self.multimask_output,
            compute_dtype=self.compute_dtype,
        )


def _load(cls, path: str | Path):
    raw = yaml.safe_load(Path(path).read_text()) or {}
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(raw) - names
    if unknown:
        raise ValueError(f"Unknown config keys in {path}: {sorted(unknown)}")
    # YAML 'None' string -> keep as string for lr_scheduler; null -> None
    return cls(**raw)


def load_train_config(path: str | Path) -> TrainConfig:
    return _load(TrainConfig, path)


def load_eval_config(path: str | Path) -> EvalConfig:
    return _load(EvalConfig, path)
