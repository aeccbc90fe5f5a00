"""Summarize a JAX profiler trace: top device ops by total time.

Usage: python scripts/xplane_top.py TRACE_DIR [-n 25]
Finds the newest *.xplane.pb under TRACE_DIR, aggregates event duration
by op name on the TPU device plane, and prints the top-N with their
share of total device time. (The parsing layer behind the roofline
analysis in docs/performance.md.)
"""

import argparse
import collections
import glob
import os
import sys


def load_xplane(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older/newer TF layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xspace, top_n=25):
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        totals = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                totals[meta.name] += ev.duration_ps
                counts[meta.name] += 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"== plane: {plane.name}  total {grand/1e12*1e3:.2f} ms ==")
        for name, ps in totals.most_common(top_n):
            print(
                f"  {ps/1e12*1e3:9.3f} ms  {100*ps/grand:5.1f}%  "
                f"x{counts[name]:<4d} {name[:110]}"
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("-n", type=int, default=25)
    args = p.parse_args()
    pbs = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    print(f"parsing {pbs[-1]}", file=sys.stderr)
    summarize(load_xplane(pbs[-1]), args.n)
