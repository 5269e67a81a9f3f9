"""Aggregate per-op device times from a jax.profiler trace directory.

The tensorboard profile plugin in this image is version-broken against its
TF, so this parses the xplane protobuf directly with a minimal schema
(tools/xplane.proto — the public, stable tensorflow.profiler layout).

Usage:
    protoc --python_out=tools tools/xplane.proto   # once
    python tools/xplane_agg.py <trace_dir> [iters]

Prints total device time and the top ops, durations divided by `iters` so a
trace of N identical iterations reads per-iteration. Ops whose names start
with 'while'/'closed_call' are CONTAINERS (durations include their children)
— read leaf ops for the real breakdown.
"""

import glob
import sys
from collections import defaultdict

sys.path.insert(0, "tools")
import xplane_pb2  # noqa: E402


def main() -> None:
    trace_dir = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    xs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xplane_pb2.XSpace()
    with open(xs, "rb") as f:
        sp.ParseFromString(f.read())
    plane = [p for p in sp.planes if "TPU" in p.name][0]
    md = plane.event_metadata
    agg, cnt = defaultdict(float), defaultdict(int)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            short = name.split(" = ")[0].lstrip("%")
            base = short.rstrip("0123456789").rstrip(".")
            agg[base] += ev.duration_ps / 1e9  # ps -> ms
            cnt[base] += 1
    total = sum(agg.values())
    print(f"total device time: {total / iters:.2f} ms/iter over {iters} iters")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t / iters:8.3f} ms/iter  x{cnt[name] // iters:<5} {name[:90]}")


if __name__ == "__main__":
    main()
