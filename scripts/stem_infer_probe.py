"""A/B the inference stem + input layout at the bench shape (r5).

Round-1 measured XLA's native 7x7/s2 stem faster than the S2D rewrite
(12.2 vs 15.7 ms/batch) and stem_s2d="auto" therefore routes inference
to the direct conv. The r5 per-op trace (scripts/infer_trace_probe.py)
shows the stem fusion at 6.33 ms / 206 GB/s and the input relayout copy
at 2.31 ms — re-measure both levers under the CURRENT bench conditions
(bf16 ingest, batch 32, 800x1344), interleaved best-of-3 per variant so
relay drift cannot fake a winner.

Variants: direct stem / S2D stem, each with default and AUTO (compiler-
chosen) input layouts.
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

from detr_tensorflow_tpu.models import DETR  # noqa: E402


def build(stem_s2d, auto_layout, variables, images):
    model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16,
                 stem_s2d=stem_s2d)

    def forward(v, im):
        out = model.apply(v, im)
        return (out["pred_logits"].astype(jnp.float32).sum()
                + out["pred_boxes"].astype(jnp.float32).sum())

    if auto_layout:
        from jax.experimental.layout import Format, Layout

        jfn = jax.jit(forward, in_shardings=(None, Format(Layout.AUTO)))
        compiled = jfn.lower(variables, images).compile()
        fmt = compiled.input_formats[0][1]
        im = jax.device_put(images, fmt)
        return compiled, im
    compiled = jax.jit(forward).lower(variables, images).compile()
    return compiled, images


def main():
    batch, h, w = 32, 800, 1344
    import ml_dtypes

    print("devices:", jax.devices(), file=sys.stderr)
    model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    jax.block_until_ready(variables)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            size=(batch, h, w, 3), dtype=np.float32).astype(
                ml_dtypes.bfloat16))

    variants = {}
    for name, (s2d, auto) in {
        "direct": (False, False),
        "s2d": (True, False),
        "direct+autolayout": (False, True),
        "s2d+autolayout": (True, True),
    }.items():
        t0 = time.time()
        fn, im = build(s2d, auto, variables, images)
        float(fn(variables, im))  # warm
        variants[name] = (fn, im)
        print(f"{name}: compiled+warm in {time.time() - t0:.1f}s",
              file=sys.stderr)

    iters = 8
    results = {k: [] for k in variants}
    for rep in range(3):
        for name, (fn, im) in variants.items():
            t0 = time.time()
            for _ in range(iters):
                r = fn(variables, im)
            float(r)
            dt = (time.time() - t0) / iters * 1e3
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f} ms/step", file=sys.stderr)
    for name, ms in results.items():
        print(f"BEST {name}: {min(ms):.2f} ms/step "
              f"({batch / min(ms) * 1e3:.1f} img/s)")


if __name__ == "__main__":
    main()
