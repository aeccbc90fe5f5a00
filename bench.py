"""Headline benchmark: DETR-R50 inference throughput at COCO-eval
resolution (1333x800, padded to 1344x800 for MXU-aligned tiling).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6); as the
stand-in baseline we use 28 images/sec — the original DETR paper's
reported R50 inference FPS on a V100, the best public proxy for the
reference TF2 stack on datacenter GPU hardware (BASELINE.md).

Methodology: bfloat16 compute on the MXU, fp32 parameters, jitted
end-to-end forward (backbone + transformer + heads). Each measured
iteration's output is consumed via a scalar reduction and the final one
is materialized on the host, forcing the whole chain to execute (simple
``block_until_ready`` proved unreliable through the remote-TPU relay).
"""

import json
import sys
import time


BASELINE_IMAGES_PER_SEC = 28.0  # DETR paper R50 V100 FPS (proxy; see header)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # persistent compile cache shaves repeat-run compile time
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from detr_tensorflow_tpu.models import DETR

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu:
        batch, height, width, iters, dtype = 32, 800, 1344, 10, "bfloat16"
    else:
        # CPU smoke config so the bench stays runnable anywhere.
        batch, height, width, iters, dtype = 1, 256, 384, 2, "float32"

    model = DETR(
        num_classes=92,
        dropout=0.0,
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype],
    )
    print(f"bench: devices={jax.devices()} dtype={dtype} "
          f"batch={batch} size={height}x{width}", file=sys.stderr)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images)
        # Scalar reduction: consumed host-side to force execution.
        return (
            out["pred_logits"].astype(jnp.float32).sum()
            + out["pred_boxes"].astype(jnp.float32).sum()
        )

    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, height, width, 3)),
        jnp.float32,
    )

    t0 = time.time()
    float(forward(variables, images))  # compile + first step
    print(f"bench: compile+first step {time.time() - t0:.1f}s", file=sys.stderr)
    float(forward(variables, images))  # steady-state warmup

    t0 = time.time()
    for _ in range(iters):
        r = forward(variables, images)
    float(r)  # materialize the tail of the in-order execution chain
    dt = time.time() - t0

    images_per_sec = batch * iters / dt
    result = {
        "metric": "DETR-R50 inference images/sec/chip @ 1333x800 (bf16, batch 32)",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient remote-TPU aborts: one retry
        print(f"bench: first attempt failed ({type(e).__name__}: {e}); "
              "retrying once", file=sys.stderr)
        main()
