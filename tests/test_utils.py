"""Utils: timing harness and tree helpers."""

import jax.numpy as jnp
import numpy as np

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
