import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from detr_tensorflow_tpu.models import DETR

batch, height, width = 32, 800, 1344
model = DETR(num_classes=92, dropout=0.0, dtype=jnp.bfloat16)
print("devices:", jax.devices(), file=sys.stderr)
t0=time.time()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
jax.block_until_ready(variables)
print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

@jax.jit
def forward(variables, images):
    out = model.apply(variables, images)
    return (out["pred_logits"].astype(jnp.float32).sum()
            + out["pred_boxes"].astype(jnp.float32).sum())

import ml_dtypes
images = jnp.asarray(
    np.random.default_rng(0).standard_normal(size=(batch, height, width, 3), dtype=np.float32).astype(ml_dtypes.bfloat16))
jax.block_until_ready(images)
t0=time.time()
float(forward(variables, images))
print(f"compile+first {time.time()-t0:.1f}s", file=sys.stderr)
float(forward(variables, images))

from detr_tensorflow_tpu.utils.profiling import trace
tdir = "/tmp/infer_trace_r5"
import shutil, os
shutil.rmtree(tdir, ignore_errors=True)
with trace(tdir):
    for _ in range(3):
        float(forward(variables, images))
print("trace at", tdir)
