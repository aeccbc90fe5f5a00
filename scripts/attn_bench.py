"""Measure pallas vs xla attention on the real chip at bench shapes.

Usage: python scripts/attn_bench.py [--full]
  default: isolated MHA layer at encoder shape (b=32, L=1050, 8h x 32d)
  --full:  whole DETR forward at 800x1344 with attn_impl xla vs pallas
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    float(jax.device_get(jax.tree.leaves(r)[0].sum()))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    float(jax.device_get(jax.tree.leaves(r)[0].sum()))
    return (time.time() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--size", type=int, nargs=2, default=(800, 1344),
                        help="input H W (default: the eval bucket)")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)

    if args.full:
        from detr_tensorflow_tpu.models import DETR

        # Relay health: a 4096^2 bf16 matmul should be ~1-10 ms; a
        # degraded relay invalidates absolute numbers (A/B within one
        # process stays valid — samples are interleaved below).
        a = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
        mm = jax.jit(lambda a: (a @ a).sum())
        float(mm(a))
        t0 = time.time()
        float(mm(a))
        print(f"relay_health: {1e3 * (time.time() - t0):.1f} ms",
              file=sys.stderr)

        h, w = args.size
        images = jnp.asarray(
            rng.normal(size=(args.batch, h, w, 3)), jnp.bfloat16
        )
        variables = None
        fns = {}
        for impl in ("xla", "pallas", "auto"):
            model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16,
                         attn_impl=impl)
            if variables is None:
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
                )

            @jax.jit
            def fwd(v, x, model=model):
                out = model.apply(v, x)
                return out["pred_logits"].astype(jnp.float32).sum()

            t0 = time.time()
            float(fwd(variables, images))
            print(f"{impl}: compile+first {time.time() - t0:.1f}s",
                  file=sys.stderr)
            fns[impl] = fwd

        # Interleave rounds so every impl sees the same relay regime;
        # report the best round per impl (relay noise only ADDS time).
        best = {k: float("inf") for k in fns}
        for _ in range(args.rounds):
            for impl, fwd in fns.items():
                t = timeit(fwd, variables, images, iters=args.iters)
                best[impl] = min(best[impl], t)
        for impl, t in best.items():
            print(f"full fwd [{impl}] b={args.batch} {h}x{w}: "
                  f"{t * 1e3:.1f} ms -> {args.batch / t:.1f} img/s")

        # Full-model XLA-vs-Pallas numerics at the production shape
        # (VERDICT r4 #1c): the max-abs logits/box diff between the two
        # attention paths on the SAME weights, on chip. Expected: bf16
        # rounding noise (the kernel's fp32 softmax matches the XLA
        # path's structure exactly).
        outs = {}
        for impl in ("xla", "pallas"):
            model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16,
                         attn_impl=impl)
            out = jax.jit(
                lambda v, x, model=model: model.apply(v, x)
            )(variables, images)
            outs[impl] = jax.device_get(
                jax.tree.map(lambda a: np.asarray(a, np.float32), out)
            )
        d_logits = float(np.abs(
            outs["xla"]["pred_logits"] - outs["pallas"]["pred_logits"]
        ).max())
        d_boxes = float(np.abs(
            outs["xla"]["pred_boxes"] - outs["pallas"]["pred_boxes"]
        ).max())
        print(f"full-model xla-vs-pallas max|diff| @ {h}x{w} b="
              f"{args.batch}: logits {d_logits:.2e}, boxes {d_boxes:.2e}")
        return

    from detr_tensorflow_tpu.ops.pallas import flash_attention

    b, l, h, dh = 32, 1050, 8, 32
    q = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= np.full((b, 1), l - 50), bool
    )

    pallas_fn = jax.jit(lambda q, k, v: flash_attention.mha(q, k, v))
    pallas_m = jax.jit(
        lambda q, k, v: flash_attention.mha(q, k, v, key_padding_mask=mask)
    )
    xla_fn = jax.jit(lambda q, k, v: flash_attention.reference_mha(q, k, v))

    t0 = time.time()
    jax.block_until_ready(pallas_fn(q, k, v))
    print(f"pallas compile {time.time() - t0:.1f}s", file=sys.stderr)

    t_x = timeit(xla_fn, q, k, v)
    t_p = timeit(pallas_fn, q, k, v)
    t_pm = timeit(pallas_m, q, k, v)
    print(f"encoder-shape MHA b={b} L={l}: xla {t_x * 1e3:.2f} ms | "
          f"pallas {t_p * 1e3:.2f} ms | pallas+mask {t_pm * 1e3:.2f} ms")

    # numerics on-chip
    o_x = np.asarray(xla_fn(q, k, v), np.float32)
    o_p = np.asarray(pallas_fn(q, k, v), np.float32)
    print("max|diff|:", float(np.abs(o_x - o_p).max()))


if __name__ == "__main__":
    main()
