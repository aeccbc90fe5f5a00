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


def main():
    print("devices:", jax.devices(), file=sys.stderr)

    for (b, h, w, c), tag in (((32, 400, 672, 64), "b32 infer"),
                              ((8, 188, 336, 64), "b8 train")):
        x = jnp.asarray(
            np.abs(np.random.default_rng(0).standard_normal(
                (b, h, w, c))).astype(np.float32), jnp.bfloat16)
        fns = {
            "xla": jax.jit(lambda x: max_pool_3x3_s2(x)
                           .astype(jnp.float32).sum()),
            "pallas": jax.jit(
                lambda x: pl_maxpool.max_pool_3x3_s2_pallas(x)
                .astype(jnp.float32).sum()),
            "pallas-mm": jax.jit(
                lambda x: pl_maxpool.max_pool_3x3_s2_pallas(
                    x, mode="matmul").astype(jnp.float32).sum()),
        }
        for f in fns.values():
            float(f(x))  # compile+warm
        # Interleaved best-of-3 rounds, each sample materialized via a
        # scalar sum (block_until_ready is unreliable over the relay).
        best = {k: 1e9 for k in fns}
        iters = 20
        for _ in range(3):
            for name, f in fns.items():
                t0 = time.time()
                for _ in range(iters):
                    r = f(x)
                float(r)
                best[name] = min(best[name],
                                 (time.time() - t0) / iters * 1e3)
        gb = (x.size + x.size // 4) * x.dtype.itemsize / 1e9
        for name, ms in best.items():
            print(f"{tag} {name}: {ms:.3f} ms  ({gb / ms * 1e3:.0f} GB/s)")
        a = jax.jit(max_pool_3x3_s2)(x)
        for mode in ("reduce", "matmul"):
            p = pl_maxpool.max_pool_3x3_s2_pallas(x, mode=mode)
            print(f"{tag} max |diff| [{mode}]:", float(jnp.abs(
                a.astype(jnp.float32) - p.astype(jnp.float32)).max()))


if __name__ == "__main__":
    main()
