"""Per-component timing probe for the training workload.

Attributes the full train step (fwd + on-device matching + set loss +
bwd + 3-group Adam) at the reference config (batch 8, 376x672, bf16)
into: forward+loss, forward+loss+backward, optimizer update, and the
whole fused step — the measurement layer under the train-throughput
metric in bench.py.

Usage: python scripts/train_probe.py [--batch 8] [--size 376 672]
       [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

# Repo-root import without PYTHONPATH (setting PYTHONPATH interferes
# with this environment's TPU-plugin discovery).
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(lambda x: float(np.asarray(jax.device_get(x)).ravel()[0]),
                 jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: float(np.asarray(jax.device_get(x)).ravel()[0]),
                 jax.tree.leaves(r)[0])
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, nargs=2, default=(376, 672))
    parser.add_argument("--lap_impl", type=str, default="xla",
                        choices=["xla", "pallas"])
    parser.add_argument("--backbone_remat", type=int, default=0,
                        help="leading ResNet stages rematerialized in "
                             "backward (HBM-traffic lever)")
    parser.add_argument("--ladder", action="store_true",
                        help="multi-scale mode: cycle the documented "
                             "size ladder twice, assert exactly one "
                             "XLA compile per rung, and print the "
                             "per-rung step-time table "
                             "(docs/data.md 'Multi-scale training')")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.ops.losses import detr_loss
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig
    from detr_tensorflow_tpu.train import optimizers as opt_lib

    b, (h, w) = args.batch, args.size
    print(f"devices={jax.devices()} batch={b} size={h}x{w}", file=sys.stderr)

    model = DETR(num_classes=92, dropout=0.1, dtype=jnp.bfloat16,
                 backbone_remat=args.backbone_remat)
    # jit(init): eager init dispatches hundreds of tiny ops through the
    # remote-TPU relay (~150s); one program is ~15s (bench.py r3 note).
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    config = TrainingConfig(
        background_class=91, train_backbone=True, train_transformers=True,
        train_nlayers=True, batch_size=b, target_batch=b,
        lap_impl=args.lap_impl,
    )
    trainer = Trainer(model, variables, config)

    rng = np.random.default_rng(0)
    n_t = 16

    import ml_dtypes

    # bf16 image ingest like the shipped pipeline (HostDataset
    # image_dtype=compute_dtype; the model computes in bf16 anyway).
    np_bf16 = np.dtype(ml_dtypes.bfloat16)

    def make_batch(bh, bw):
        return jax.device_put({
            "images": rng.normal(size=(b, bh, bw, 3)).astype(np_bf16),
            "boxes": np.clip(rng.uniform(0.2, 0.8, size=(b, n_t, 4)), 0.05,
                             0.95).astype(np.float32),
            "classes": rng.integers(1, 80, size=(b, n_t)).astype(np.int32),
            "mask": np.tile([True] * 8 + [False] * (n_t - 8), (b, 1)),
        })

    if args.ladder:
        # Multi-scale evidence (VERDICT r3 #7): one compiled program per
        # rung, reused forever after. Two full cycles — the second must
        # add zero compiles — then a timed pass per rung.
        ladder = ((320, 576), (376, 672), (432, 768))
        batches = {hw: make_batch(*hw) for hw in ladder}
        t_compile = {}
        for hw in ladder:
            t0 = time.time()
            log = trainer.step(batches[hw])
            float(jax.device_get(log["total_loss"]))
            t_compile[hw] = time.time() - t0
        n_compiles = trainer.compile_count
        assert n_compiles == len(ladder), (n_compiles, len(ladder))
        for hw in ladder:  # cycle 2: cache hits only
            log = trainer.step(batches[hw])
            float(jax.device_get(log["total_loss"]))
        assert trainer.compile_count == len(ladder)
        print(f"compiles: {n_compiles} == len(ladder) == {len(ladder)} "
              "(cycle 2 added none)")
        print(f"{'rung':>10} | {'compile+1st (s)':>15} | "
              f"{'step (ms)':>9} | {'img/s/chip':>10}")
        for hw in ladder:
            t = timeit(lambda: trainer.step(batches[hw])["total_loss"],
                       iters=10)
            print(f"{hw[0]}x{hw[1]:<5} | {t_compile[hw]:>15.1f} | "
                  f"{t*1e3:>9.2f} | {b/t:>10.1f}")
        assert trainer.compile_count == len(ladder)
        return

    batch = jax.device_put({
        "images": rng.normal(size=(b, h, w, 3)).astype(np_bf16),
        "boxes": np.clip(rng.uniform(0.2, 0.8, size=(b, n_t, 4)), 0.05,
                         0.95).astype(np.float32),
        "classes": rng.integers(1, 80, size=(b, n_t)).astype(np.int32),
        "mask": np.tile([True] * 8 + [False] * (n_t - 8), (b, 1)),
    })

    params = trainer.state.params
    frozen = trainer.state.frozen
    key = jax.random.PRNGKey(1)

    def loss_fn(p):
        out = model.apply({"params": p, "frozen": frozen}, batch["images"],
                          train=True, rngs={"dropout": key})
        total, _ = detr_loss(out, batch["boxes"], batch["classes"],
                             batch["mask"], 91, lap_impl=args.lap_impl)
        return total

    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[0:2])

    t_fwd = timeit(lambda: fwd(params), iters=10)
    print(f"forward + matching + loss:        {t_fwd*1e3:7.2f} ms")

    t_fb = timeit(lambda: fwd_bwd(params), iters=10)
    print(f"  + backward:                     {t_fb*1e3:7.2f} ms")

    grads = jax.jit(lambda p: jax.grad(loss_fn)(p))(params)
    tx = trainer.tx
    opt_state = trainer.state.opt_state
    lrs = opt_lib.lr_dict(config)

    @jax.jit
    def opt_only(g, s, p):
        import optax

        updates, s2 = tx.update(g, s, p)
        updates = opt_lib.scale_updates_by_lr(updates, lrs)
        return optax.apply_updates(p, updates), s2

    t_opt = timeit(lambda: opt_only(grads, opt_state, params), iters=10)
    print(f"optimizer (clipnorm+Adam+apply):  {t_opt*1e3:7.2f} ms")

    def full_step():
        log = trainer.step(batch)
        return log["total_loss"]

    t_step = timeit(full_step, iters=10)
    ips = b / t_step
    print(f"full fused train step:            {t_step*1e3:7.2f} ms "
          f"({ips:.1f} img/s/chip)")

    if args.trace:
        from detr_tensorflow_tpu.utils import trace

        with trace(args.trace):
            for _ in range(3):
                log = trainer.step(batch)
            float(jax.device_get(log["total_loss"]))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
