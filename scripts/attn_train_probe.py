"""Re-measure the XLA/Pallas attention crossover for the TRAIN step.

The r4 crossover table (models/transformer.py:33-48) that fixed
``AUTO_PALLAS_MIN_KEYS = 1024`` was measured forward-only with the old
fixed q_block=128 kernel. Round 5's auto q_block made the kernel ~15%
faster, and the train step (batch 8, 376x672 -> 252 keys) is
byte-bound — XLA materializes the (B*H, L, L) score matrices in HBM on
the forward AND keeps them for the backward, bytes the flash kernel
deletes. This probe times the FULL train step (fwd + on-device matching
+ set loss + bwd + 3-group Adam, dropout 0.1 — the reference recipe,
reference transformer.py:8) with the attention routed three ways:

  xla        every attention on XLA (the pre-r5 auto behavior)
  pallas     every attention on the flash kernel (incl. 100-key
             decoder self-attn, where the 128-pad overhead is pure tax)
  auto@N     AUTO_PALLAS_MIN_KEYS_TRAIN monkeypatched to N so encoder
             self-attn + decoder cross-attn (lk=252) route to the
             kernel while decoder self-attn (lk=100) stays on XLA
             (auto@128 is the shipped default since this probe's r5
             measurement — see models/transformer.py)

Interleaved best-of-3 wall timing per variant (relay-noise hygiene like
scripts/attn_bench.py). Usage:
  python scripts/attn_train_probe.py [--batch 8] [--size 376 672]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn()
    float(jax.device_get(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    float(jax.device_get(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, nargs=2, default=(376, 672))
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--iters", type=int, default=10)
    # 128 sits in (100, 252]: encoder self-attn + cross-attn (252 keys)
    # route to the kernel, decoder self-attn (100 keys) stays on XLA.
    parser.add_argument("--thresholds", type=int, nargs="*", default=[128])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.models import transformer as tfm
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig

    b, (h, w) = args.batch, args.size
    # stride-32 feature map rounds UP at each stride-2 stage (SAME pads)
    lk = -(-h // 32) * (-(-w // 32))
    print(f"devices={jax.devices()} batch={b} size={h}x{w} keys={lk}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    n_t = 16
    np_bf16 = np.dtype(ml_dtypes.bfloat16)
    batch = jax.device_put({
        "images": rng.normal(size=(b, h, w, 3)).astype(np_bf16),
        "boxes": np.clip(rng.uniform(0.2, 0.8, size=(b, n_t, 4)), 0.05,
                         0.95).astype(np.float32),
        "classes": rng.integers(1, 80, size=(b, n_t)).astype(np.int32),
        "mask": np.tile([True] * 8 + [False] * (n_t - 8), (b, 1)),
    })

    variants = [("xla", "xla", None), ("pallas", "pallas", None)]
    variants += [(f"auto@{t}", "auto", t) for t in args.thresholds]

    steppers = {}
    orig_min = tfm.AUTO_PALLAS_MIN_KEYS_TRAIN
    for name, impl, thresh in variants:
        tfm.AUTO_PALLAS_MIN_KEYS_TRAIN = (
            thresh if thresh is not None else orig_min)
        model = DETR(num_classes=92, dropout=0.1, dtype=jnp.bfloat16,
                     attn_impl=impl)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        config = TrainingConfig(
            background_class=91, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=b, target_batch=b)
        trainer = Trainer(model, variables, config)
        t0 = time.time()
        log = trainer.step(batch)  # compile (trace-time dispatch!)
        float(jax.device_get(log["total_loss"]))
        print(f"{name}: compile+1st {time.time() - t0:.1f}s",
              file=sys.stderr)
        steppers[name] = trainer
    tfm.AUTO_PALLAS_MIN_KEYS_TRAIN = orig_min

    best = {name: float("inf") for name, _, _ in variants}
    for r in range(args.rounds):
        for name, _, _ in variants:  # interleaved: relay noise hygiene
            tr = steppers[name]
            t = timeit(lambda tr=tr: tr.step(batch)["total_loss"],
                       iters=args.iters)
            best[name] = min(best[name], t)
            print(f"round {r}: {name:>9} {t * 1e3:7.2f} ms "
                  f"({b / t:6.1f} img/s)", file=sys.stderr)

    # Stall-proof companion: per-variant device time from short profiler
    # traces (wall-clock through the relay can be depressed 3-10x in bad
    # windows — the r5 run saw 92 ms outliers on a 30 ms step).
    import tempfile

    from detr_tensorflow_tpu.utils.profiling import (
        device_stats_per_step, trace,
    )

    dev = {}
    for _ in range(2):
        for name, _, _ in variants:
            tr = steppers[name]
            try:
                tdir = tempfile.mkdtemp(prefix="attn_train_probe_")
                with trace(tdir):
                    for _ in range(3):
                        float(jax.device_get(
                            tr.step(batch)["total_loss"]))
                stats = device_stats_per_step(tdir, steps=3)
                if stats and (name not in dev
                              or stats["device_ms"] < dev[name]["device_ms"]):
                    dev[name] = stats
            except Exception as e:
                print(f"trace {name}: failed ({e})", file=sys.stderr)

    print(f"\n{'variant':>9} | {'wall ms':>8} | {'img/s':>7} | "
          f"{'dev ms':>7} | {'dev img/s':>9} | {'GB':>6} | {'GB/s':>6}")
    for name, _, _ in variants:
        t = best[name]
        d = dev.get(name) or {}
        dms = d.get("device_ms")
        print(f"{name:>9} | {t * 1e3:>8.2f} | {b / t:>7.1f} | "
              f"{dms or float('nan'):>7.2f} | "
              f"{(b / (dms / 1e3)) if dms else float('nan'):>9.1f} | "
              f"{d.get('gb_accessed') or float('nan'):>6.2f} | "
              f"{d.get('gbps') or float('nan'):>6.0f}")


if __name__ == "__main__":
    main()
