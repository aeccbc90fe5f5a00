"""Microbenchmark: stem maxpool backward — select-and-scatter vs gather.

Train-step roofline (docs/performance.md) attributes ~1.8 ms of the
376x672 b8 train step to the stem pool's select-and-scatter backward at
110-293 GB/s. This probes the swap candidate ops/maxpool.py at the same
shape, fwd+bwd, in isolation.

Usage: PYTHONPATH=/root/.axon_site python scripts/maxpool_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from detr_tensorflow_tpu.ops.maxpool import max_pool_3x3_s2


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def bench(fn, x, ct, n=50):
    g = jax.jit(jax.grad(lambda a: jnp.sum(fn(a) * ct)))
    out = g(x)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    # Stem activation at the benched train shape: b8 376x672 -> 188x336x64.
    x = jnp.asarray(rng.normal(size=(8, 188, 336, 64)).astype(np.float32))
    ct_shape = _ref(x).shape
    ct = jnp.asarray(rng.normal(size=ct_shape).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        xd, cd = x.astype(dt), ct.astype(dt)
        t_ref = bench(_ref, xd, cd)
        t_new = bench(max_pool_3x3_s2, xd, cd)
        # Bytes: grad reads x (or 9 views) + ct, writes dx.
        nbytes = xd.nbytes + cd.nbytes + xd.nbytes
        print(
            f"{jnp.dtype(dt).name}: select-and-scatter {t_ref:.3f} ms "
            f"({nbytes / t_ref / 1e6:.0f} GB/s), gather {t_new:.3f} ms "
            f"({nbytes / t_new / 1e6:.0f} GB/s), speedup {t_ref / t_new:.2f}x"
        )


if __name__ == "__main__":
    main()
