"""HBM-traffic roofline from a JAX profiler trace.

Aggregates per-op device time and XLA's ``bytes_accessed`` stat from
the TPU plane of an xplane trace, prints the top ops with achieved
bandwidth, and the whole-program totals — the measurement layer behind
the roofline tables in docs/performance.md.

Usage: python scripts/xplane_bytes.py TRACE_DIR [--steps N] [-n 25]

``--steps N`` divides totals by the number of traced iterations so the
table reads in per-step units. ``copy-start``/``copy-done`` spans are
async DMA bookkeeping whose durations overlap real compute; they are
excluded from the time totals (their bytes still count).
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from xplane_top import load_xplane  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--steps", type=int, default=1)
    parser.add_argument("-n", type=int, default=25)
    args = parser.parse_args()

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    xs = load_xplane(paths[-1])

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        stat_names = {
            sid: m.name for sid, m in plane.stat_metadata.items()
        }
        time_ps = collections.Counter()
        bytes_acc = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            # Leaf HLO ops only: "XLA Modules"/"Steps" spans envelope
            # the same time, and "Async XLA Ops" (copy-start etc.) are
            # DMA spans that overlap real compute (their durations are
            # inflated by the wait — memory note r2).
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name
                b = 0
                for st in list(ev.stats) + list(meta.stats):
                    if stat_names.get(st.metadata_id) == "bytes_accessed":
                        b = max(
                            b,
                            st.uint64_value or st.int64_value or 0,
                        )
                time_ps[name] += ev.duration_ps
                bytes_acc[name] += b
                counts[name] += 1
        if not time_ps:
            continue

        total_ms = sum(time_ps.values()) / 1e9 / args.steps
        total_gb = sum(bytes_acc.values()) / 1e9 / args.steps
        print(f"plane: {plane.name}")
        print(
            f"per-step totals ({args.steps} steps): "
            f"{total_ms:.2f} ms device time, {total_gb:.2f} GB accessed, "
            f"{total_gb / (total_ms / 1e3):.0f} GB/s sustained"
        )
        print(f"{'op':60s} {'ms/step':>8s} {'GB/step':>8s} {'GB/s':>6s} {'n':>5s}")
        for name, ps in time_ps.most_common(args.n):
            ms = ps / 1e9 / args.steps
            gb = bytes_acc[name] / 1e9 / args.steps
            bw = gb / (ms / 1e3) if ms > 0 else 0.0
            print(f"{name[:60]:60s} {ms:8.3f} {gb:8.3f} {bw:6.0f} {counts[name]:5d}")
        break


if __name__ == "__main__":
    main()
