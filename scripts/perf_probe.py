"""Per-component timing probe for the headline inference workload.

Attributes the DETR-R50 forward at 800x1344 bf16 into backbone stages /
transformer / heads, and sweeps batch size — the measurement layer under
VERDICT task 2 (raise single-chip MFU). Timings materialize a scalar
reduction of the output (block_until_ready is unreliable through the
axon relay; see utils/profiling.py).

Usage: python scripts/perf_probe.py [--trace DIR]
"""

import argparse
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    float(jax.device_get(r))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    float(jax.device_get(r))
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--size", type=int, nargs=2, default=(800, 1344))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.models.resnet import ResNetBackbone

    b, (h, w) = args.batch, args.size
    print(f"devices={jax.devices()} batch={b} size={h}x{w}", file=sys.stderr)

    model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)

    @jax.jit
    def full(v, x):
        out = model.apply(v, x)
        return out["pred_logits"].astype(jnp.float32).sum() + out[
            "pred_boxes"
        ].astype(jnp.float32).sum()

    t_full = timeit(full, variables, images)
    print(f"full forward: {t_full * 1e3:.1f} ms -> {b / t_full:.1f} img/s")

    # Backbone only (rest = full - backbone).
    backbone = ResNetBackbone(stage_sizes=(3, 4, 6, 3), dtype=jnp.bfloat16)
    bvars = {
        "params": variables["params"]["backbone"],
        "frozen": variables["frozen"]["backbone"],
    }

    @jax.jit
    def bb(v, x):
        return backbone.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32).sum()

    t_bb = timeit(bb, bvars, images)
    print(
        f"backbone:     {t_bb * 1e3:.1f} ms ({100 * t_bb / t_full:.0f}%)  "
        f"transformer+heads (residual): {(t_full - t_bb) * 1e3:.1f} ms"
    )

    # Per-stage attribution: run truncated backbones (stem, stem+L1, ...).
    prev = 0.0
    for k in range(5):
        trunc = ResNetBackbone(
            stage_sizes=(3, 4, 6, 3)[:k] if k else (),
            dtype=jnp.bfloat16,
        )

        @jax.jit
        def tr(v, x, trunc=trunc):
            return trunc.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32).sum()

        try:
            t_k = timeit(tr, bvars, images, iters=5)
            name = "stem" if k == 0 else f"+layer{k}"
            print(f"  {name:8s} cumulative {t_k * 1e3:7.1f} ms  (+{(t_k - prev) * 1e3:6.1f} ms)")
            prev = t_k
        except Exception as e:
            print(f"  stage {k} probe failed: {type(e).__name__}: {e}")
            break

    # Cost analysis: XLA's own flop count for the full program.
    lowered = jax.jit(
        lambda v, x: model.apply(v, x)
    ).lower(variables, images)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if ca:
        flops = ca.get("flops", 0.0)
        print(
            f"XLA cost: {flops / 1e9:.1f} GFLOP/batch -> "
            f"{flops / t_full / 1e12:.1f} TFLOP/s "
            f"({100 * flops / t_full / 394e12:.1f}% of v5e peak)"
        )

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                r = full(variables, images)
            float(jax.device_get(r))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
