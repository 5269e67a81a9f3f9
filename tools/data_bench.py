"""Input-pipeline throughput benchmark: does the loader keep the chip fed?

The train step consumes ~70 samples/s/chip at B=8 (BASELINE.md batch-scaling
table). This measures the HOST side — on-disk JPEG/PNG triplets through
CORDataset (PIL decode + train augmentations + the C++ Pillow-bit-exact
resample/normalize data plane, reference: utils/dataloader.py:79-199) and the
thread-pool DataLoader — in samples/s, per worker count.

Builds a disposable synthetic on-disk dataset (real encoded images at
reference geometry: ~1024x768 query JPEGs, 384x384 support JPEGs, PNG masks)
so decode cost is realistic.

Usage: python tools/data_bench.py [--rows 64] [--batch 8] [--workers 2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_disk_dataset(root: Path, rows: int) -> Path:
    from PIL import Image

    rng = np.random.default_rng(0)
    ds = root / "coco"
    for sub in ("image", "mask/cat", "mask/sup"):
        (ds / sub).mkdir(parents=True, exist_ok=True)
    lines = ["Id,Compose,Dataset,Target,Query_img,Query_mask,Support_img,Support_mask,Text,query_cat"]
    for i in range(rows):
        q = rng.integers(0, 255, (768, 1024, 3), np.uint8)
        s = rng.integers(0, 255, (384, 384, 3), np.uint8)
        qm = (rng.random((768, 1024)) > 0.7).astype(np.uint8) * 255
        sm = (rng.random((384, 384)) > 0.7).astype(np.uint8) * 255
        Image.fromarray(q).save(ds / f"image/q{i}.jpg", quality=90)
        Image.fromarray(s).save(ds / f"image/s{i}.jpg", quality=90)
        Image.fromarray(qm).save(ds / f"mask/cat/qm{i}.png")
        Image.fromarray(sm).save(ds / f"mask/sup/sm{i}.png")
        # path scheme (CORDataset._paths): {root}/{Dataset}/image/{Query_img},
        # {root}/{Dataset}/mask/{Target}/{Query_mask}, mask/sup/{Support_mask}
        lines.append(
            f"{i},0,coco,cat,q{i}.jpg,qm{i}.png,s{i}.jpg,sm{i}.png,change the object,cat"
        )
    csv = root / "train.csv"
    csv.write_text("\n".join(lines) + "\n")
    return csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", default="2,4,8")
    ap.add_argument("--epochs", type=int, default=3, help="first epoch warms page cache")
    ap.add_argument(
        "--scaling-check", action="store_true",
        help="PROVE (not extrapolate) thread scaling through the "
             "GIL-released C++ data plane: sweep workers 1,2,4,...,"
             "min(cpus,16) and require >=50%% parallel efficiency at the "
             "top of the ladder. On a 1-vCPU host the assertion is "
             "SKIPPED with a message — the harness is the standing proof "
             "waiting for a multi-core host (BASELINE.md's per-host "
             "numbers are per-core x N extrapolations until this runs "
             "somewhere real).",
    )
    args = ap.parse_args()

    from cor_tpu.data.pipeline import CORDataset, DataLoader

    root = Path(tempfile.mkdtemp(prefix="cor_data_bench_"))
    try:
        csv = build_disk_dataset(root, args.rows)

        def measure(nw: int) -> dict:
            ds = CORDataset(csv_path=str(csv), dataset_path=str(root), train=True)
            loader = DataLoader(
                ds, batch_size=args.batch, shuffle=True, drop_last=True, num_workers=nw
            )
            n = 0
            t0 = None
            for ep in range(args.epochs):
                if ep == 1:  # epoch 0 warms the page cache / thread pool
                    t0, n = time.perf_counter(), 0
                for b in loader:
                    n += b["query_img"].shape[0]
            dt = time.perf_counter() - t0
            r = {"num_workers": nw, "samples_per_sec": round(n / dt, 1)}
            print(json.dumps(r))
            return r

        ncpu = os.cpu_count() or 1
        if args.scaling_check:
            ladder = [1]
            while ladder[-1] * 2 <= min(ncpu, 16):
                ladder.append(ladder[-1] * 2)
            workers = ladder
        else:
            workers = [int(w) for w in args.workers.split(",")]
        results = [measure(nw) for nw in workers]
        print(
            json.dumps(
                {
                    "all": results,
                    "rows": args.rows,
                    "batch": args.batch,
                    # report the core count so numbers are comparable across
                    # hosts (a TPU-VM host has ~100+ vCPUs)
                    "host_cpus": ncpu,
                }
            )
        )
        if args.scaling_check:
            if ncpu < 2:
                print(json.dumps({
                    "scaling_check": "SKIPPED",
                    "reason": f"host has {ncpu} vCPU — thread scaling is "
                              "unmeasurable here; the single-worker "
                              "samples/s above is the measured per-core "
                              "number",
                }))
                return
            top = results[-1]
            speedup = top["samples_per_sec"] / max(results[0]["samples_per_sec"], 1e-9)
            efficiency = speedup / top["num_workers"]
            verdict = {
                "scaling_check": "PASS" if efficiency >= 0.5 else "FAIL",
                "workers": top["num_workers"],
                "speedup_vs_1": round(speedup, 2),
                "parallel_efficiency": round(efficiency, 3),
                "bar": ">=0.5 efficiency at the ladder top (GIL-released "
                       "C++ plane should scale near-linearly until disk-bound)",
            }
            print(json.dumps(verdict))
            if verdict["scaling_check"] == "FAIL":
                sys.exit(1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
