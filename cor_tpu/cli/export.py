"""Export entry point: an Orbax checkpoint trained here -> the reference's
torch CORE checkpoint format.

Completes the round-trip with the import path (cor_tpu.utils.convert): a model
trained by ``cor_tpu.cli.train`` can be handed to the reference ecosystem —
its eval entry loads the exported file exactly like one of its own
(reference: my_test.py:117-185 reads ``model_state_dict`` with a
missing/unexpected/mismatch audit; utils/trainer_v3_g.py:133-142 defines the
checkpoint dict format written here).

    python -m cor_tpu.cli.export \
        --checkpoint runs/ckpt/checkpoint_epoch_10 \
        --out checkpoint_epoch_10.pth

Works on any checkpoint this framework writes (epoch saves, best_model,
best_model_full, interrupted saves) — the params subtree and the epoch/loss
metadata are taken from the checkpoint payload itself, so no config file is
needed.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def export_checkpoint(checkpoint: str | Path, out: str | Path) -> dict:
    """Restore the raw Orbax payload and write the reference-format .pth.

    Returns a small summary dict (epoch, loss, n_keys) for logging/tests.
    """
    from cor_tpu.train.checkpoint import restore_checkpoint
    from cor_tpu.utils.export import export_core_state_dict, save_core_checkpoint

    ckpt = Path(checkpoint)
    if not ckpt.exists():
        raise FileNotFoundError(f"checkpoint directory not found: {ckpt}")
    payload = restore_checkpoint(ckpt.parent, ckpt.name)
    params = payload.get("params", payload) if isinstance(payload, dict) else payload
    epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
    loss = payload.get("loss") if isinstance(payload, dict) else None
    loss = float(loss) if loss is not None else None

    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    sd = export_core_state_dict(params)  # built ONCE (fp32 copy of everything)
    save_core_checkpoint(str(out), epoch=epoch, loss=loss, state_dict=sd)
    return {"epoch": epoch, "loss": loss, "n_keys": len(sd), "out": str(out)}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export an Orbax checkpoint to the reference torch CORE format"
    )
    parser.add_argument(
        "--checkpoint",
        required=True,
        help="Orbax checkpoint directory (e.g. .../checkpoint_epoch_10 or .../best_model)",
    )
    parser.add_argument("--out", required=True, help="output .pth path")
    args = parser.parse_args(argv)

    summary = export_checkpoint(args.checkpoint, args.out)
    print(
        f"exported {summary['n_keys']} parameters (epoch {summary['epoch']}, "
        f"loss {summary['loss']}) -> {summary['out']}"
    )


if __name__ == "__main__":
    main()
