"""Pipeline parallelism: GPipe-style stage pipelining over a mesh axis.

The third scaling axis (after data — parallel/mesh.py — and tensor —
parallel/tp.py), expressed the TPU way: SPMD over a ``stage`` mesh axis
inside ``shard_map``, activations rotated between neighbouring stages
with ``jax.lax.ppermute`` (nearest-neighbour ICI traffic — no host
involvement, no send/recv framework; cf. the reference, which has no
parallelism at all, README.md:135 "Multi GPU training comming soon").

Schedule: classic GPipe. The batch splits into ``n_micro``
microbatches; at step ``t`` stage ``s`` processes microbatch ``t - s``,
so the pipeline fills for S-1 steps, streams, and drains for S-1 steps
— bubble fraction (S-1)/(T+S-1). Every stage executes the same traced
program (`lax.scan` over steps) — there is no per-stage code, which is
what makes it one XLA program that AD differentiates end-to-end
(ppermute/scan/psum all have transpose rules, so the same construct
trains).

Composition: the ``shard_map`` in/out specs carry an optional data axis
alongside the stage axis, so DP x PP runs as one mesh
(``make_mesh(axis_names=("data", "stage"), ...)``) with gradient
all-reduce over ``data`` inserted by GSPMD outside the shard_map as
usual (tested). Layering TP *inside* a stage would use shard_map's
auto-axes (manual over ``stage``, GSPMD over ``model``) — left for a
model that actually needs three axes at once.

At DETR scale (41M params) PP is not *needed* — this is the framework
capability that lets the same codebase scale a deeper/wider variant
past one chip's HBM (SURVEY.md §2.6 scale-out).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Pytree = Any


def stack_stage_params(per_stage: Sequence[Pytree]) -> Pytree:
    """Stack per-stage parameter pytrees along a new leading stage axis
    (the axis ``pipeline_forward`` shards over)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_forward(
    stage_fn: Callable[[Pytree, jnp.ndarray], jnp.ndarray],
    stage_params: Pytree,  # leading dim = n_stages on every leaf
    x: jnp.ndarray,        # (B, ...) — activations; stage-invariant shape
    mesh: Mesh,
    *,
    n_micro: int,
    stage_axis: str = "stage",
    data_axis: str = None,  # set to compose DP x PP on a 2-D mesh
) -> jnp.ndarray:
    """Run ``x`` through ``n_stages`` pipelined applications of
    ``stage_fn`` (stage i uses ``stage_params[i]``), GPipe-scheduled.

    ``stage_fn(params_i, a) -> a`` must preserve the activation shape
    (true of transformer layer stacks). Returns the full-batch output,
    replicated over the stage axis (one psum of the output at the end).
    Differentiable; jit-compatible (wrap in jit for real use).
    """
    n_stages = mesh.shape[stage_axis]
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    xs = x.reshape(n_micro, mb, *x.shape[1:])
    # S-1 drain steps: stage 0 sees dummy microbatches past the end.
    pad = jnp.zeros((n_stages - 1,) + xs.shape[1:], x.dtype)
    xs_padded = jnp.concatenate([xs, pad], axis=0)

    def per_stage(params, xs_local):
        p = jax.tree.map(lambda a: a[0], params)  # this stage's params
        s_idx = jax.lax.axis_index(stage_axis)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def step(prev_out, x_t):
            # prev_out: this stage's output from the previous step; the
            # rotated value is what stage s-1 finished one step ago —
            # exactly microbatch (t - s) under the GPipe schedule.
            recv = jax.lax.ppermute(prev_out, stage_axis, perm)
            inp = jnp.where(s_idx == 0, x_t, recv)
            out = stage_fn(p, inp)
            return out, out

        zero = jnp.zeros(xs_local.shape[1:], x.dtype)
        _, ys = jax.lax.scan(step, zero, xs_local)
        # Last stage's steps S-1 .. S+T-2 hold the T real outputs.
        valid = ys[n_stages - 1:]
        # Replicate across stages: only the last stage contributes.
        contrib = jnp.where(s_idx == n_stages - 1, valid, 0)
        return jax.lax.psum(contrib, stage_axis)

    spec_x = P(None, data_axis) if data_axis else P()
    out = shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(stage_axis), spec_x),
        out_specs=spec_x,
        check_vma=False,
    )(stage_params, xs_padded)
    return out.reshape(b, *x.shape[1:])


def split_layers_into_stages(
    layer_params: Sequence[Pytree], n_stages: int
) -> Pytree:
    """[params_layer_0 .. params_layer_{L-1}] -> stacked stage params,
    each stage owning L/n_stages consecutive layers: every leaf gains
    leading dims (n_stages, layers_per_stage)."""
    n_layers = len(layer_params)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per = n_layers // n_stages
    stages = [
        jax.tree.map(
            lambda *xs: jnp.stack(xs), *layer_params[i * per:(i + 1) * per]
        )
        for i in range(n_stages)
    ]
    return stack_stage_params(stages)


def scan_layers(apply_one: Callable[[Pytree, jnp.ndarray], jnp.ndarray]):
    """Lift a single-layer apply into a stage_fn over stacked layer
    params ((layers_per_stage, ...) leaves) via lax.scan — the
    standard homogeneous-stack pattern inside each pipeline stage."""

    def stage_fn(stacked, a):
        def body(carry, p):
            return apply_one(p, carry), None

        out, _ = jax.lax.scan(body, a, stacked)
        return out

    return stage_fn


def pipeline_transformer_encoder(
    encoder_layer_apply: Callable[[Pytree, jnp.ndarray], jnp.ndarray],
    encoder_layer_params: Sequence[Pytree],
    src: jnp.ndarray,
    mesh: Mesh,
    *,
    n_stages: int = None,
    n_micro: int = None,
    stage_axis: str = "stage",
    data_axis: str = None,
) -> jnp.ndarray:
    """Pipeline a DETR encoder stack (models/transformer.py layers
    ``encoder_layer_{i}``) over the mesh's stage axis.

    ``encoder_layer_apply(params, src) -> src`` is one layer's apply
    with positions/masks closed over (they are identical across layers).
    """
    if n_stages is None:
        n_stages = mesh.shape[stage_axis]
    if n_micro is None:
        n_micro = max(2 * n_stages, 1)  # keep the bubble under ~33%
        while src.shape[0] % n_micro:
            n_micro //= 2
    stage_params = split_layers_into_stages(encoder_layer_params, n_stages)
    return pipeline_forward(
        scan_layers(encoder_layer_apply), stage_params, src, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
    )
