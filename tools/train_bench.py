"""Flagship train-step batch-scaling benchmark (real TPU chip).

Measures ms/step and samples/sec/chip at several batch sizes (the reference
trains at batch 10 — config/train_config/train_config_m3.yaml), plus an MFU
estimate from XLA's own cost analysis, and optionally compares the frozen
encoder's per-block remat on vs off (it should be free: the encoder output
is stop_gradient'ed, so no backward — and no remat recompute — exists).

Timing: train steps are state-dependency-chained (each step consumes the
previous step's donated state), which forces real execution on the axon
relay; the final loss fetch synchronizes.

Usage:  python tools/train_bench.py [--batches 2,4,8,10,16] [--steps 8]
        [--compare-remat]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8,10,16")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--compare-remat", action="store_true")
    ap.add_argument("--compare-ln", action="store_true",
                    help="also time B=8 with the encoder's Pallas LayerNorms off")
    ap.add_argument("--unfrozen", action="store_true",
                    help="time the FULL fine-tune step (freeze_towers=False: "
                         "backward through SAM encoder + SigLIP via the "
                         "kernels' oracle-VJP custom_vjps)")
    ap.add_argument("--sam", default="sam_base",
                    choices=("sam_base", "sam_large", "sam_huge"),
                    help="SAM encoder size (sam_huge exercises the lane-pad "
                         "shim's flash backward at head_dim 80)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from cor_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from dataclasses import replace

    from cor_tpu.models.core_model import CoreConfig, init_core_model
    from cor_tpu.models.sam_encoder import SamEncoderConfig
    from cor_tpu.train.optim import make_optimizer
    from cor_tpu.train.step import create_train_state, make_train_step

    PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s

    rng = np.random.default_rng(0)

    def run(cfg: CoreConfig, B: int, steps: int):
        params = init_core_model(jax.random.PRNGKey(0), cfg)
        tx, _ = make_optimizer(params, freeze_towers=cfg.freeze_towers)
        train_step = make_train_step(cfg, tx)
        batch = {
            "query_img": jnp.asarray(
                rng.standard_normal((B, 1024, 1024, 3)).astype(np.float32)
            ),
            "query_mask": jnp.asarray(
                (rng.random((B, 1024, 1024, 1)) > 0.7).astype(np.float32)
            ),
            "support_img": jnp.asarray(
                rng.standard_normal((B, 384, 384, 3)).astype(np.float32)
            ),
            "support_mask": jnp.asarray(
                (rng.random((B, 384, 384, 1)) > 0.5).astype(np.float32)
            ),
            "text": jnp.asarray(rng.integers(2, 32000, (B, 64)).astype(np.int32)),
            "valid": jnp.ones((B,), jnp.float32),
        }
        state = create_train_state(params, tx)
        key = jax.random.PRNGKey(1)
        lr = jnp.float32(1e-4)

        flops = None
        try:
            lowered = train_step.lower(state, batch, key, lr)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass

        # warmup (and compile, if lower() above didn't already)
        state, m = train_step(state, batch, key, lr)
        float(m["total_loss"])  # sync

        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = train_step(state, batch, key, lr)
        float(m["total_loss"])  # chained states force execution; fetch syncs
        dt = (time.perf_counter() - t0) / steps
        out = {
            "batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "samples_per_sec": round(B / dt, 2),
        }
        if flops:
            out["xla_flops_per_step"] = flops
            out["mfu_vs_v5e_peak"] = round(flops / dt / PEAK_BF16, 4)
        return out

    base = CoreConfig(
        sam_model=args.sam,
        siglip_model="ViT-B-16-SigLIP-384",
        mask_pooling="MaskAdapterPooling",
        multimask_output=False,
        compute_dtype="bfloat16",
    )
    results = []
    for B in [int(b) for b in args.batches.split(",")]:
        r = run(base, B, args.steps)
        print(json.dumps(r), flush=True)
        results.append(r)

    if args.unfrozen:
        unfrozen = replace(base, freeze_towers=False)
        for B in [int(b) for b in args.batches.split(",")]:
            r = run(unfrozen, B, args.steps)
            r["variant"] = "unfrozen_full_fine_tune"
            print(json.dumps(r), flush=True)
            results.append(r)

    if args.compare_ln:
        xla_ln = replace(
            base, encoder_override=replace(base.encoder, fused_layernorm=False)
        )
        r = run(xla_ln, 8, args.steps)
        r["variant"] = "encoder_xla_layernorm"
        print(json.dumps(r), flush=True)
        results.append(r)

    if args.compare_remat:
        no_remat = replace(
            base, encoder_override=replace(base.encoder, remat_blocks=False)
        )
        B = 10
        r = run(no_remat, B, args.steps)
        r["variant"] = "remat_off"
        print(json.dumps(r), flush=True)
        results.append(r)
        if args.unfrozen:
            # unfrozen is where remat actually costs FLOPs (the encoder has
            # a real backward); off may win if activations fit HBM
            uf = replace(no_remat, freeze_towers=False)
            for B in [int(b) for b in args.batches.split(",")]:
                r = run(uf, B, args.steps)
                r["variant"] = "unfrozen_remat_off"
                print(json.dumps(r), flush=True)
                results.append(r)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
