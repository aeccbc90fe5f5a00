"""Warm-vs-cold train-step compile through the persistent cache (r5).

BENCH_r04 recorded 98.2 s for the b8 train-step compile. The bench
wires jax_compilation_cache_dir, so a second run on the same machine
should hit the persistent cache and compile in seconds — this probe
measures exactly the bench's AOT path (Trainer.aot_compiled with AUTO
input layouts) in a fresh process and prints the phase breakdown, so
BENCH_r05's cold/warm numbers are attributable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import ml_dtypes

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig

    batch, height, width = 8, 376, 672
    print("devices:", jax.devices(), file=sys.stderr)
    model = DETR(num_classes=92, dropout=0.1, dtype=jax.numpy.bfloat16)
    t0 = time.time()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 64, 64, 3))
    )
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s")
    config = TrainingConfig(
        background_class=91, train_backbone=True,
        train_transformers=True, train_nlayers=True,
        batch_size=batch, target_batch=batch,
    )
    trainer = Trainer(model, variables, config)
    rng = np.random.default_rng(0)
    n_t = 16
    batch_data = jax.device_put({
        "images": rng.normal(size=(batch, height, width, 3)).astype(
            np.dtype(ml_dtypes.bfloat16)),
        "boxes": np.clip(rng.uniform(0.2, 0.8, size=(batch, n_t, 4)),
                         0.05, 0.95).astype(np.float32),
        "classes": rng.integers(1, 80, size=(batch, n_t)).astype(np.int32),
        "mask": np.tile([True] * 8 + [False] * (n_t - 8), (batch, 1)),
    })
    t0 = time.time()
    compiled, put_batch = trainer.aot_compiled(batch_data)
    t_compile = time.time() - t0
    batch_data = put_batch(batch_data)
    t0 = time.time()
    st, log = compiled(trainer.state, batch_data, trainer._lrs)
    print(f"first-exec loss={float(jax.device_get(log['total_loss'])):.3f}"
          f" in {time.time() - t0:.1f}s")
    print(f"aot compile (cache dir {jax.config.jax_compilation_cache_dir},"
          f" {'warm' if t_compile < 20 else 'cold?'}): {t_compile:.1f}s")


if __name__ == "__main__":
    main()
