"""Measure the fused bottleneck kernel vs the XLA chain, per R50 stage.

Headline inference geometry (800x1344, batch 32): identity-block shapes
  L2: (32, 200, 336, 256) mid 64    L3: (32, 100, 168, 512) mid 128
  L4: (32,  50,  84, 1024) mid 256  L5: (32,  25,  42, 2048) mid 512

Prints per-stage: XLA ms, fused ms, speedup, parity error.
Usage: PYTHONPATH=... python scripts/fused_bottleneck_probe.py [--batch 32]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from detr_tensorflow_tpu.ops.pallas.fused_bottleneck import (
    fused_bottleneck, reference_bottleneck,
)

STAGES = [  # (h, w, c, mid, n_identity_blocks) — smallest first
    ("L5", 25, 42, 2048, 512, 2),
    ("L4", 50, 84, 1024, 256, 5),
    ("L3", 100, 168, 512, 128, 3),
    ("L2", 200, 336, 256, 64, 2),
]


def relay_health():
    """~1.3 ms of real device work; wildly larger wall time means the
    relay is in a stall episode and measurements are garbage."""
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: (x @ x).sum().astype(jnp.float32))
    float(f(a))
    t0 = time.time()
    for _ in range(4):
        r = f(a)
    float(r)
    return (time.time() - t0) / 4


def timeit(fn, *args, iters=8):
    r = fn(*args)
    jax.block_until_ready(r)
    float(jnp.sum(r[..., 0]).astype(jnp.float32))  # compile the probe sum
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r[..., 0]).astype(jnp.float32))  # force the chain
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices={jax.devices()}", file=sys.stderr)

    print(f"relay health: {relay_health()*1e3:.1f} ms for a ~1.3 ms matmul",
          flush=True)
    rng = np.random.default_rng(0)
    total_xla = total_fused = 0.0
    for name, h, w, c, m, blocks in STAGES:
        x = jnp.asarray(
            rng.normal(size=(args.batch, h, w, c)), jnp.bfloat16
        )
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * (1.0 / np.sqrt(s[-2]))
        )
        w1, w2, w3 = mk(1, 1, c, m), mk(3, 3, m, m), mk(1, 1, m, c)
        b1, b2, b3 = mk(4, m)[0], mk(4, m)[0], mk(4, c)[0]

        ref = jax.jit(reference_bottleneck)
        fus = jax.jit(lambda *a: fused_bottleneck(*a))

        t_ref = timeit(ref, x, w1, b1, w2, b2, w3, b3, iters=args.iters)
        t_fus = timeit(fus, x, w1, b1, w2, b2, w3, b3, iters=args.iters)
        print(f"  [health now: {relay_health()*1e3:.1f} ms]", flush=True)

        err = float(jnp.max(jnp.abs(
            ref(x, w1, b1, w2, b2, w3, b3).astype(jnp.float32)
            - fus(x, w1, b1, w2, b2, w3, b3).astype(jnp.float32)
        )))
        gb = args.batch * h * w * c * 2 * 2 / 1e9  # in+out, bf16
        print(
            f"{name} ({args.batch}x{h}x{w}x{c} mid {m}): "
            f"xla {t_ref*1e3:7.2f} ms | fused {t_fus*1e3:7.2f} ms "
            f"({t_ref/t_fus:4.2f}x) | fused BW {gb/t_fus:5.0f} GB/s | "
            f"maxerr {err:.3g} | x{blocks} blocks -> "
            f"{(t_ref-t_fus)*blocks*1e3:+6.2f} ms/model",
            flush=True,
        )
        total_xla += t_ref * blocks
        total_fused += t_fus * blocks
    print(
        f"identity-block total: xla {total_xla*1e3:.1f} ms, "
        f"fused {total_fused*1e3:.1f} ms ({total_xla/total_fused:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
