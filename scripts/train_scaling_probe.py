"""Per-op device-time tables for the train step at b8/b16/b32 (r5).

BENCH_r04's train_batch_scaling rows inverted round 3's amortization
story (b16/b32 devicetime img/s BELOW b8). This probe traces the exact
Trainer AOT step at each batch size and prints the per-op table so the
regression is attributable op by op (candidate: the vmapped JV matcher's
while_loop runs to the batch-MAX iteration count, which grows ~log B).

Usage: python scripts/train_scaling_probe.py [--batches 8 16 32]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[8, 16, 32])
    parser.add_argument("--top", type=int, default=12)
    args = parser.parse_args()

    import ml_dtypes

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig
    from detr_tensorflow_tpu.utils.profiling import trace

    height, width = 376, 672
    model = DETR(num_classes=92, dropout=0.1, dtype=jax.numpy.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 64, 64, 3))
    )
    jax.block_until_ready(variables)
    print("devices:", jax.devices(), file=sys.stderr)

    for batch in args.batches:
        config = TrainingConfig(
            background_class=91, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=batch, target_batch=batch,
        )
        trainer = Trainer(model, variables, config)
        rng = np.random.default_rng(0)
        n_t = 16
        batch_data = jax.device_put({
            "images": rng.normal(
                size=(batch, height, width, 3)
            ).astype(np.dtype(ml_dtypes.bfloat16)),
            "boxes": np.clip(
                rng.uniform(0.2, 0.8, size=(batch, n_t, 4)), 0.05, 0.95
            ).astype(np.float32),
            "classes": rng.integers(1, 80, size=(batch, n_t)).astype(
                np.int32),
            "mask": np.tile([True] * 8 + [False] * (n_t - 8), (batch, 1)),
        })
        t0 = time.time()
        compiled, put_batch = trainer.aot_compiled(batch_data)
        batch_data = put_batch(batch_data)
        holder = {"state": trainer.state}

        def step_once():
            holder["state"], log = compiled(
                holder["state"], batch_data, trainer._lrs
            )
            return float(jax.device_get(log["total_loss"]))

        step_once()
        print(f"b{batch}: compiled+warm {time.time() - t0:.1f}s",
              file=sys.stderr)
        tdir = f"/tmp/train_scale_b{batch}"
        shutil.rmtree(tdir, ignore_errors=True)
        with trace(tdir):
            for _ in range(3):
                step_once()
        print(f"\n===== batch {batch} =====")
        os.system(
            f"{sys.executable} {os.path.dirname(__file__)}/xplane_bytes.py "
            f"{tdir} --steps 3 -n {args.top} 2>/dev/null"
        )
        del holder, compiled, trainer


if __name__ == "__main__":
    main()
