"""Aggregate per-op device times from a jax.profiler trace directory.

The tensorboard profile plugin in this image is version-broken against its
TF, so this parses the xplane protobuf directly with a minimal schema
(tools/xplane.proto — the public, stable tensorflow.profiler layout).

Usage:
    protoc --python_out=tools tools/xplane.proto   # once
    python tools/xplane_agg.py <trace_dir> [iters]

Prints total device time and the top ops, durations divided by `iters` so a
trace of N identical iterations reads per-iteration. Ops whose names start
with 'while'/'conditional' are CONTAINERS (durations include their children,
which are listed separately) — they are EXCLUDED from the leaf total and
marked [CONTAINER]. closed_call (Pallas kernels) counts as a leaf: its inner
custom-call is not emitted separately. Pass --detail to list individual op instances (no base-name
collapsing), which shows whether one fusion dominates its class.
"""

import glob
import sys
from collections import defaultdict

sys.path.insert(0, "tools")
import xplane_pb2  # noqa: E402


# closed_call (Pallas kernels wrapped by named_call) has NO separately-listed
# children on the "XLA Ops" line, so it behaves as a leaf; while/conditional
# bodies' ops ARE listed separately and would double count.
_CONTAINERS = ("while", "conditional")


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--detail"]
    detail = "--detail" in sys.argv
    trace_dir = argv[0]
    iters = int(argv[1]) if len(argv) > 1 else 1
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
            base = short if detail else short.rstrip("0123456789").rstrip(".")
            agg[base] += ev.duration_ps / 1e9  # ps -> ms
            cnt[base] += 1
    is_cont = lambda n: n.startswith(_CONTAINERS)
    total = sum(t for n, t in agg.items() if not is_cont(n))
    print(f"total LEAF device time: {total / iters:.2f} ms/iter over {iters} iters")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        tag = "  [CONTAINER, incl. children]" if is_cont(name) else ""
        print(f"{t / iters:8.3f} ms/iter  x{cnt[name] // iters:<5} {name[:90]}{tag}")


if __name__ == "__main__":
    main()
