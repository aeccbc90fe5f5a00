"""Measure the int8 quantized-inference path on the real TPU chip.

Three levels (each printed as its own line):
  1. kernel microbench — Pallas int8 3x3 conv vs XLA bf16 conv vs XLA
     int8 conv at the four R50 stride-1 bottleneck shapes of the
     headline workload (batch 32 @ 800x1344);
  2. backbone — quant_backbone_forward vs bf16 ResNetBackbone;
  3. full model — DETR(backbone_quant=True) vs bf16 DETR.

Timing methodology: materialize a scalar reduction (utils/profiling.py —
block_until_ready is unreliable through the axon relay).

Usage: python scripts/quant_probe.py [--level 1|2|3] [--batch 32]
"""

import argparse
import sys
import time

import numpy as np

TRACE_DIR = None  # set from --trace


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


def level1(batch):
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.ops.pallas.int8_conv import conv3x3_int8

    rng = np.random.default_rng(0)
    # (H, W, C) of the stride-1 3x3 bottleneck convs at 800x1344.
    shapes = [(200, 336, 64), (100, 168, 128), (50, 84, 256), (25, 42, 512)]
    for h, w, c in shapes:
        x8 = jnp.asarray(rng.integers(-128, 128, (batch, h, w, c), np.int8))
        w8 = jnp.asarray(rng.integers(-128, 128, (3, 3, c, c), np.int8))
        sc = jnp.full((c,), 1e-3, jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)

        @jax.jit
        def pallas_fn(x, wt):
            return conv3x3_int8(
                x, wt, sc, bi, relu=True, out_dtype=jnp.int8
            ).astype(jnp.float32).sum()

        @jax.jit
        def xla_bf16(x, wt):
            y = jax.lax.conv_general_dilated(
                x, wt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.maximum(y, 0).astype(jnp.float32).sum()

        @jax.jit
        def xla_int8(x, wt):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.int32), wt.astype(jnp.int32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jnp.maximum(y.astype(jnp.float32) * sc + bi, 0)
            return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8).astype(jnp.float32).sum()

        try:
            tp = timeit(pallas_fn, x8, w8)
        except Exception as e:  # VMEM overflow etc. — report and move on
            print(f"  {h}x{w}x{c}: pallas FAILED: {type(e).__name__}: {str(e)[:200]}")
            tp = None
        tb = timeit(xla_bf16, xb, wb)
        ti = timeit(xla_int8, x8, w8)
        msg = f"  {h}x{w}x{c}: bf16 {tb*1e3:7.2f} ms  xla-int8 {ti*1e3:7.2f} ms"
        if tp is not None:
            msg += f"  pallas-int8 {tp*1e3:7.2f} ms  ({tb/tp:0.2f}x vs bf16)"
        print(msg, flush=True)


def _bench_inputs(batch, h, w):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.bfloat16)


def level2(batch, size):
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.models import quantized as Q
    from detr_tensorflow_tpu.models.resnet import ResNetBackbone

    h, w = size
    rng = np.random.default_rng(0)
    model = ResNetBackbone(dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), small)
    images = jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.bfloat16)

    calib = jax.jit(
        lambda v, x: Q.calibrate_backbone(v, x)
    )(variables, images[:2].astype(jnp.float32))
    qt = Q.quantize_backbone(variables, calib)

    @jax.jit
    def fp(v, x):
        return model.apply(v, x).astype(jnp.float32).sum()

    @jax.jit
    def qf_xla(q, x):
        return Q.quant_backbone_forward(
            q, x, use_pallas=False
        ).astype(jnp.float32).sum()

    @jax.jit
    def qf_pallas(q, x):
        return Q.quant_backbone_forward(
            q, x, precise=False
        ).astype(jnp.float32).sum()

    tb = timeit(fp, variables, images)
    tx = timeit(qf_xla, qt, images)
    print(
        f"backbone {h}x{w} b{batch}: bf16 {tb*1e3:.1f} ms "
        f"int8-xla {tx*1e3:.1f} ms ({tb/tx:0.2f}x)", flush=True,
    )
    try:
        tp = timeit(qf_pallas, qt, images)
        print(f"  int8-pallas {tp*1e3:.1f} ms ({tb/tp:0.2f}x)", flush=True)
    except Exception as e:
        print(f"  int8-pallas FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    if TRACE_DIR:
        for tag, f, a in (("bf16", fp, variables), ("int8xla", qf_xla, qt)):
            with jax.profiler.trace(f"{TRACE_DIR}/{tag}"):
                for _ in range(3):
                    r = f(a, images)
                float(jax.device_get(r))
        print(f"traces in {TRACE_DIR}/{{bf16,int8xla}}", flush=True)


def level3(batch, size):
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.models import quantized as Q

    h, w = size
    rng = np.random.default_rng(0)
    kw = dict(num_classes=92, dropout=0.0, dtype=jnp.bfloat16)
    model = DETR(**kw)
    variables = dict(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    images = jnp.asarray(rng.normal(size=(batch, h, w, 3)), jnp.bfloat16)

    qv = Q.quantize_model(variables, images[:2].astype(jnp.float32))
    qmodel = DETR(**kw, backbone_quant=True)

    @jax.jit
    def fp(v, x):
        o = model.apply(v, x)
        return o["pred_logits"].astype(jnp.float32).sum() + o[
            "pred_boxes"].astype(jnp.float32).sum()

    @jax.jit
    def qf(v, x):
        o = qmodel.apply(v, x)
        return o["pred_logits"].astype(jnp.float32).sum() + o[
            "pred_boxes"].astype(jnp.float32).sum()

    tb = timeit(fp, variables, images)
    tq = timeit(qf, qv, images)
    print(
        f"DETR-R50 {h}x{w} b{batch}: bf16 {tb*1e3:.1f} ms "
        f"({batch/tb:.1f} img/s)  int8-backbone {tq*1e3:.1f} ms "
        f"({batch/tq:.1f} img/s, {tb/tq:0.2f}x)", flush=True,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=1)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, nargs=2, default=(800, 1344))
    p.add_argument("--trace", type=str, default=None)
    args = p.parse_args()
    TRACE_DIR = args.trace

    import jax
    import jax.numpy as jnp  # noqa: F401

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices={jax.devices()}", file=sys.stderr)

    if args.level == 1:
        level1(args.batch)
    elif args.level == 2:
        import jax.numpy as jnp
        level2(args.batch, args.size)
    else:
        level3(args.batch, args.size)
