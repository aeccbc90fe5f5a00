"""Profiling and timing.

The reference's only observability is wall-clock prints every 100 steps
(detr_tf/training.py:57-63; SURVEY.md §5 'Tracing/profiling: None').
Here:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting
    an xprof/tensorboard-compatible device trace;
  * ``Timer`` / ``benchmark_fn`` — synchronized wall-clock timing that
    materializes outputs, robust to async dispatch (including the
    remote-TPU relay where ``block_until_ready`` alone can be
    unreliable — see bench.py);
  * ``device_ms_per_step(trace_dir)`` — leaf-HLO device time from an
    xplane trace: the only stall-proof throughput metric through the
    remote-TPU relay, whose multi-minute stall episodes depress
    wall-clock numbers by up to 10x without touching device time
    (docs/performance.md "Cold start").
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace viewable in xprof / tensorboard-profile."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_ms_per_step(trace_dir: str, steps: int = 1) -> Optional[float]:
    """Per-step device time (ms) from the newest xplane trace under
    ``trace_dir`` — see ``device_stats_per_step``."""
    stats = device_stats_per_step(trace_dir, steps)
    return stats["device_ms"] if stats else None


def device_stats_per_step(trace_dir: str, steps: int = 1) -> Optional[dict]:
    """Per-step device stats from the newest xplane trace under
    ``trace_dir``: sum of leaf-HLO ("XLA Ops" line) event durations and
    XLA's ``bytes_accessed`` on the TPU plane, divided by ``steps``.

    Returns ``{"device_ms", "gb_accessed", "gbps"}`` (gb fields None
    when the trace carries no bytes_accessed stats). Excludes host
    time, dispatch latency, and relay stalls by construction —
    wall-clock throughput from a degraded relay window is not
    comparable across runs, device time is (same method as
    scripts/xplane_bytes.py, the layer behind docs/performance.md's
    roofline tables). Returns None when no trace/TPU plane is found or
    the xplane protobuf is unavailable.
    """
    import glob
    import os

    try:
        try:
            from tensorflow.tsl.profiler.protobuf import xplane_pb2
        except ImportError:  # older/newer TF layouts
            from tensorflow.core.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        stat_names = {sid: m.name for sid, m in plane.stat_metadata.items()}
        total_ps = 0
        total_bytes = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total_ps += ev.duration_ps
                meta = plane.event_metadata[ev.metadata_id]
                b = 0
                for st in list(ev.stats) + list(meta.stats):
                    if stat_names.get(st.metadata_id) == "bytes_accessed":
                        b = max(b, st.uint64_value or st.int64_value or 0)
                total_bytes += b
        if total_ps:
            ms = total_ps / 1e9 / max(1, steps)
            gb = total_bytes / 1e9 / max(1, steps)
            return {
                "device_ms": ms,
                "gb_accessed": gb if total_bytes else None,
                "gbps": (gb / (ms / 1e3)) if total_bytes else None,
            }
    return None


def _materialize(x):
    """Force execution of a pytree's computation chain."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]).reshape(-1)[:1])
    return x


class Timer:
    """Accumulating section timer: ``with timer('fwd'): ...``."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                _materialize(sync_result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:>24}: {total:8.3f}s total, {total / n * 1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)


def benchmark_fn(
    fn: Callable,
    *args,
    iters: int = 20,
    warmup: int = 2,
    name: Optional[str] = None,
) -> dict:
    """Time a jitted callable: returns {'ms_per_iter', 'iters', 'name'}.

    Chains ``iters`` dispatches and materializes only the final output —
    in-order device execution bounds total time correctly while avoiding
    a host sync per iteration.
    """
    for _ in range(warmup):
        out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _materialize(out)
    dt = time.perf_counter() - t0
    return {
        "name": name or getattr(fn, "__name__", "fn"),
        "ms_per_iter": dt / iters * 1e3,
        "iters": iters,
    }
