"""Isolated maxpool at the inference stem shape (r5).

The r5 inference trace attributes 4.15 ms / 332 GB/s to the maxpool
fusion (bf16[32,400,672,64] -> [32,200,336,64]) while round-4 train
measurements had the same reduce_window at ~667 GB/s on the b8 train
shape. Measure the op isolated at the b32 inference shape, in both the
default layout and the stem fusion's actual output layout, plus a
Pallas row-loop variant — to decide whether a custom kernel is worth
shipping.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from detr_tensorflow_tpu.ops.maxpool import max_pool_3x3_s2  # noqa: E402
from detr_tensorflow_tpu.ops.pallas import maxpool as pl_maxpool  # noqa: E402


def bench(fn, x, label, iters=20):
    f = jax.jit(fn)
    r = f(x)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            r = f(x)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / iters * 1e3)
    gb = (x.size + r.size) * x.dtype.itemsize / 1e9
    print(f"{label}: {best:.3f} ms  ({gb / best * 1e3:.0f} GB/s)")
    return best


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    b, h, w, c = 32, 400, 672, 64
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, c)).astype(
            np.float32), jnp.bfloat16)
    bench(max_pool_3x3_s2, x, "xla reduce_window (b32 infer shape)")
    bench(pl_maxpool.max_pool_3x3_s2_pallas, x, "pallas maxpool")
    # parity
    a = jax.jit(max_pool_3x3_s2)(x)
    p = jax.jit(pl_maxpool.max_pool_3x3_s2_pallas)(x)
    print("max |diff|:", float(jnp.abs(
        a.astype(jnp.float32) - p.astype(jnp.float32)).max()))
    # train shape too
    xt = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 188, 336, 64)).astype(
            np.float32), jnp.bfloat16)
    bench(max_pool_3x3_s2, xt, "xla reduce_window (b8 train shape)")
    bench(pl_maxpool.max_pool_3x3_s2_pallas, xt, "pallas maxpool (train)")


if __name__ == "__main__":
    main()
