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
usual (tested). TP *inside* a stage is the third axis (``tp_axis=``):
the shard_map goes partial-manual (``axis_names`` lists only
stage/data), the model axis stays *auto*, and GSPMD shards each stage's
matmuls from the parameters' own TP shardings (parallel/tp.py
annotations ride through the stacked stage params) — DP x PP x TP in
one XLA program, no new communication code
(tests/test_pipeline_parallel.py).

At DETR scale (41M params) PP is not *needed* — this is the framework
capability that lets the same codebase scale a deeper/wider variant
past one chip's HBM (SURVEY.md §2.6 scale-out).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Pytree = Any


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Static configuration for a pipelined encoder (models/transformer
    ``pipeline=`` field; frozen/hashable so it can live on a flax
    module).

    Attrs:
      mesh: the device mesh carrying ``stage_axis`` (and optionally a
        data axis for DP x PP and a model axis for TP-inside-stage).
      n_micro: microbatches per batch (None = 2*n_stages rounded down
        to divide the batch).
      stage_axis / data_axis: mesh axis names.
      tp_axis: mesh axis for tensor parallelism *inside* each stage —
        left auto (GSPMD) while stage/data are manual; shard the
        parameters over it with parallel/tp.py.
      remat_stage: rematerialize each stage application in the backward
        pass (``jax.checkpoint``): live activation memory drops from
        every layer of every in-flight microbatch to one stage boundary
        per microbatch — the memory profile 1F1B schedules chase,
        bought with ~1/3 more FLOPs instead of schedule complexity.
    """

    mesh: Mesh
    n_micro: Optional[int] = None
    stage_axis: str = "stage"
    data_axis: Optional[str] = None
    tp_axis: Optional[str] = None
    remat_stage: bool = False


def stack_stage_params(per_stage: Sequence[Pytree]) -> Pytree:
    """Stack per-stage parameter pytrees along a new leading stage axis
    (the axis ``pipeline_forward`` shards over)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_forward(
    stage_fn: Callable[[Pytree, Pytree], Pytree],
    stage_params: Pytree,  # leading dim = n_stages on every leaf
    x: Pytree,             # (B, ...) leaves — activations (pytree OK)
    mesh: Mesh,
    *,
    n_micro: int,
    stage_axis: str = "stage",
    data_axis: str = None,  # set to compose DP x PP on a 2-D mesh
    tp_axis: str = None,    # set to compose TP inside each stage (auto axis)
    remat_stage: bool = False,  # checkpoint each stage application
) -> Pytree:
    """Run ``x`` through ``n_stages`` pipelined applications of
    ``stage_fn`` (stage i uses ``stage_params[i]``), GPipe-scheduled.

    ``stage_fn(params_i, a) -> a`` must preserve the activation
    structure and shapes (true of transformer layer stacks). ``x`` may
    be a PYTREE of (B, ...) arrays: every leaf is microbatched and
    rotated between stages together — how per-microbatch side inputs
    (positions, padding masks) travel with their activations instead of
    being closed over (closure capture would break under a sharded data
    axis). Returns the full-batch output, replicated over the stage axis
    (one psum of the output at the end). Differentiable; jit-compatible
    (wrap in jit for real use).
    """
    n_stages = mesh.shape[stage_axis]
    if remat_stage:
        # Store only stage-boundary activations; recompute the layers
        # inside each stage during backward. With GPipe's all-forward-
        # then-all-backward AD schedule this caps live activations at
        # one boundary tensor per in-flight microbatch — the memory
        # profile 1F1B chases — for ~1/3 extra FLOPs.
        stage_fn = jax.checkpoint(stage_fn)
    leaves = jax.tree.leaves(x)
    b = leaves[0].shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    xs = jax.tree.map(
        lambda a: a.reshape(n_micro, mb, *a.shape[1:]), x
    )
    # S-1 drain steps: stage 0 sees dummy microbatches past the end.
    xs_padded = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((n_stages - 1,) + a.shape[1:], a.dtype)], axis=0
        ),
        xs,
    )

    def per_stage(params, xs_local):
        p = jax.tree.map(lambda a: a[0], params)  # this stage's params
        s_idx = jax.lax.axis_index(stage_axis)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def step(prev_out, x_t):
            # prev_out: this stage's output from the previous step; the
            # rotated value is what stage s-1 finished one step ago —
            # exactly microbatch (t - s) under the GPipe schedule.
            recv = jax.lax.ppermute(prev_out, stage_axis, perm)
            inp = jax.tree.map(
                lambda a, r: jnp.where(s_idx == 0, a, r), x_t, recv
            )
            out = stage_fn(p, inp)
            return out, out

        zero = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), xs_local
        )
        _, ys = jax.lax.scan(step, zero, xs_local)
        # Last stage's steps S-1 .. S+T-2 hold the T real outputs.
        valid = jax.tree.map(lambda a: a[n_stages - 1:], ys)
        # Replicate across stages: only the last stage contributes.
        return jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(s_idx == n_stages - 1, a, 0), stage_axis
            ),
            valid,
        )

    spec_x = P(None, data_axis) if data_axis else P()
    kwargs = {}
    if tp_axis is not None:
        # Partial-manual: stage (and data) are manual inside the body,
        # tp_axis stays auto so GSPMD shards each stage's matmuls from
        # the parameters' own TP shardings (parallel/tp.py) and inserts
        # the per-block all-reduce itself.
        kwargs["axis_names"] = frozenset(
            {stage_axis} | ({data_axis} if data_axis else set())
        )
    out = shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(stage_axis), spec_x),
        out_specs=spec_x,
        check_vma=False,
        **kwargs,
    )(stage_params, xs_padded)
    return jax.tree.map(
        lambda a: a.reshape(b, *a.shape[2:]), out
    )


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
    tp_axis: str = None,
    remat_stage: bool = False,
) -> jnp.ndarray:
    """Pipeline a DETR encoder stack (models/transformer.py layers
    ``encoder_layer_{i}``) over the mesh's stage axis.

    ``encoder_layer_apply(params, src) -> src`` is one layer's apply
    with positions/masks closed over (they are identical across layers).
    """
    if n_stages is None:
        n_stages = mesh.shape[stage_axis]
    if n_micro is None:
        # Largest feasible <= 2*n_stages (bubble under ~33%); the
        # microbatch dim must stay divisible by the data axis.
        b = jax.tree.leaves(src)[0].shape[0]
        data = mesh.shape[data_axis] if data_axis else 1
        n_micro = max(2 * n_stages, 1)
        while n_micro > 1 and (b % n_micro or (b // n_micro) % data):
            n_micro //= 2
    stage_params = split_layers_into_stages(encoder_layer_params, n_stages)
    return pipeline_forward(
        scan_layers(encoder_layer_apply), stage_params, src, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
        tp_axis=tp_axis, remat_stage=remat_stage,
    )
