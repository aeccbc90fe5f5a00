"""Utils: timing harness and tree helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from detr_tensorflow_tpu.utils import Timer, benchmark_fn, tree_size, tree_bytes


def test_benchmark_fn_runs():
    import jax

    f = jax.jit(lambda x: (x * 2).sum())
    r = benchmark_fn(f, jnp.ones((128, 128)), iters=3, warmup=1)
    assert r["ms_per_iter"] > 0
    assert r["iters"] == 3


def test_timer_accumulates():
    t = Timer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.summary()


def test_tree_size_bytes():
    tree = {"x": np.zeros((4, 4), np.float32), "y": {"z": np.zeros((8,), np.int32)}}
    assert tree_size(tree) == 16 + 8
    assert tree_bytes(tree) == 16 * 4 + 8 * 4


def test_device_ms_per_step_parses_tpu_plane(tmp_path):
    """device_ms_per_step: sums leaf-HLO ("XLA Ops") durations on the
    TPU plane of an xplane trace and divides by steps; ignores other
    planes/lines; None when no trace exists."""
    from detr_tensorflow_tpu.utils import device_ms_per_step

    assert device_ms_per_step(str(tmp_path)) is None

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    ops = plane.lines.add(name="XLA Ops")
    # Two leaf ops totalling 6 ms over 3 steps -> 2 ms/step.
    e1 = ops.events.add(duration_ps=int(4e9))
    e2 = ops.events.add(duration_ps=int(2e9))
    del e1, e2
    other = plane.lines.add(name="Async XLA Ops")  # excluded
    other.events.add(duration_ps=int(100e9))
    host = xs.planes.add(name="/host:CPU")  # not a TPU plane
    hl = host.lines.add(name="XLA Ops")
    hl.events.add(duration_ps=int(50e9))
    (tmp_path / "t.xplane.pb").write_bytes(xs.SerializeToString())

    assert device_ms_per_step(str(tmp_path), steps=3) == pytest.approx(2.0)
