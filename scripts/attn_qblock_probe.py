"""q_block sweep for the flash-attention kernel at the production shape.

The kernel is VPU-bound (fp32 softmax) at the 800x1344 bucket; the
remaining tunable is q_block: larger blocks amortize K/V VMEM loads
(9 reloads per batch*head at 128 vs 3 at 384) at the cost of more
query-side padding (1050 -> 1152/1280/1536). Interleaved best-of-3.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
from detr_tensorflow_tpu.ops.pallas import flash_attention

b, l, h, dh = 32, 1050, 8, 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16) * dh**-0.5
k = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.bfloat16)

fns = {}
for qb in (128, 256, 384, 1152):
    fns[qb] = jax.jit(lambda q, k, v, qb=qb: flash_attention.mha(
        q, k, v, q_block=qb).astype(jnp.float32).sum())
    t0 = time.time()
    float(fns[qb](q, k, v))
    print(f"qb={qb}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)

best = {qb: 1e9 for qb in fns}
for _ in range(3):
    for qb, f in fns.items():
        t0 = time.time()
        for _ in range(20):
            r = f(q, k, v)
        float(r)
        best[qb] = min(best[qb], (time.time()-t0)/20*1e3)
ref = jax.jit(lambda q, k, v: flash_attention.reference_mha(
    q, k, v).astype(jnp.float32).sum())
float(ref(q, k, v))
t0 = time.time()
for _ in range(20):
    r = ref(q, k, v)
float(r)
print(f"xla reference: {(time.time()-t0)/20*1e3:.3f} ms")
for qb, ms in best.items():
    print(f"q_block={qb}: {ms:.3f} ms")
