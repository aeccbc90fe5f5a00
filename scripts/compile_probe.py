"""Bisect the cold-compile time of the serving graph (BENCH_r02: 774.5s).

The train step (fwd+bwd+matcher+Adam, batch 8 @ 376x672) cold-compiles in
~27s while the inference graph (batch 32 @ 800x1344 bf16) took 774.5s in
the round-2 driver run. This probe AOT-compiles sub-graphs separately to
find where the time goes:

  1. backbone only          (convs at 800x1344 -> stride-32 map)
  2. transformer+heads only (seq 25*42=1050, batch 32)
  3. full model

Run COLD (no persistent cache):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_probe.py [part ...]

Optionally set XLA_FLAGS before running to test compile-time flags.
"""

import sys
import time

import jax
import jax.numpy as jnp

from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.models.resnet import resnet50_backbone
from detr_tensorflow_tpu.models.transformer import Transformer

B, H, W = 32, 800, 1344
DTYPE = jnp.bfloat16


def timed(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"probe[{name}]: lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s",
          flush=True)


def probe_backbone():
    model = resnet50_backbone(dtype=DTYPE)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def fwd(v, x):
        return model.apply(v, x)

    x = jax.ShapeDtypeStruct((B, H, W, 3), DTYPE)
    timed("backbone b32 800x1344", fwd, variables, x)


def probe_transformer():
    model = Transformer(model_dim=256, num_heads=8, dropout=0.0, dtype=DTYPE)
    seq = (H // 32) * (W // 32)
    src = jnp.zeros((1, seq, 256), DTYPE)
    pos = jnp.zeros((1, seq, 256), DTYPE)
    q = jnp.zeros((100, 256), DTYPE)
    variables = model.init(jax.random.PRNGKey(0), src, pos, q)

    def fwd(v, s, p, qq):
        return model.apply(v, s, p, qq)

    s = jax.ShapeDtypeStruct((B, seq, 256), DTYPE)
    p = jax.ShapeDtypeStruct((B, seq, 256), DTYPE)
    timed(f"transformer b32 seq{seq}", fwd, variables, s, p, q)


def probe_full():
    model = DETR(num_classes=92, dropout=0.0, dtype=DTYPE)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def fwd(v, x):
        out = model.apply(v, x)
        return (out["pred_logits"].astype(jnp.float32).sum()
                + out["pred_boxes"].astype(jnp.float32).sum())

    x = jax.ShapeDtypeStruct((B, H, W, 3), DTYPE)
    timed("full b32 800x1344", fwd, variables, x)


if __name__ == "__main__":
    parts = sys.argv[1:] or ["backbone", "transformer", "full"]
    print(f"probe: devices={jax.devices()} parts={parts}", flush=True)
    for p in parts:
        {"backbone": probe_backbone,
         "transformer": probe_transformer,
         "full": probe_full}[p]()
