"""Pipeline parallelism: GPipe-style stage pipelining over a mesh axis.

The third scaling axis (after data — parallel/mesh.py — and tensor —
parallel/tp.py), expressed the TPU way: SPMD over a ``stage`` mesh axis
inside ``shard_map``, activations rotated between neighbouring stages
with ``jax.lax.ppermute`` (nearest-neighbour ICI traffic — no host
involvement, no send/recv framework; cf. the reference, which has no
parallelism at all, README.md:135 "Multi GPU training comming soon").

Two schedules:

* **GPipe** (``pipeline_forward``): at step ``t`` stage ``s`` processes
  microbatch ``t - s``; fill for S-1 steps, stream, drain for S-1 —
  bubble fraction (S-1)/(T+S-1). Every stage executes the same traced
  program (`lax.scan` over steps) — one XLA program that AD
  differentiates end-to-end (ppermute/scan/psum all have transpose
  rules), which is what makes it a model-level *flag*
  (``PipelineSpec``) rather than a training-loop rewrite.
* **1F1B** (``pipeline_train_1f1b``): the interleaved
  one-forward-one-backward schedule as an explicit-VJP training
  primitive — loss scored per-microbatch at the last stage, backward
  waves overlapped with forward waves in the same scan, residuals in
  an O(S) ring buffer. Live memory is bounded by pipeline depth
  instead of GPipe+AD's O(n_micro), so ``n_micro`` can grow until the
  bubble is negligible — which is also why a Megatron-style
  virtual-stage interleave is unnecessary here: its purpose is
  shrinking the bubble when memory caps ``n_micro``, and this
  schedule removes that cap.

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
        per microbatch — a big constant-factor saving, though still
        O(n_micro); the true depth-bounded schedule is
        ``pipeline_train_1f1b``.
    """

    mesh: Mesh
    n_micro: Optional[int] = None
    stage_axis: str = "stage"
    data_axis: Optional[str] = None
    tp_axis: Optional[str] = None
    remat_stage: bool = False


def choose_n_micro(batch: int, n_stages: int, data: int = 1) -> int:
    """Largest feasible microbatch count <= 2*n_stages (bubble under
    ~33%): must divide the batch, and each microbatch must stay
    divisible by the data axis. Raises when no count works — a silent
    fall-through would die later with an opaque shard_map shape
    error."""
    n_micro = max(2 * n_stages, 1)
    while n_micro > 1 and (batch % n_micro or (batch // n_micro) % data):
        n_micro //= 2
    if batch % n_micro or (batch // n_micro) % data:
        raise ValueError(
            f"batch {batch} cannot be microbatched over data axis "
            f"{data}: batch must be divisible by the data-parallel size"
        )
    return n_micro


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


def pipeline_train_1f1b(
    stage_fn: Callable[[Pytree, Pytree], Pytree],
    loss_fn: Callable[[Pytree, Pytree], jnp.ndarray],
    stage_params: Pytree,  # leading dim = n_stages on every leaf
    x: Pytree,             # (B, ...) leaves — first-stage input
    targets: Pytree,       # (B, ...) leaves — consumed by loss_fn
    mesh: Mesh,
    *,
    n_micro: int,
    stage_axis: str = "stage",
    data_axis: str = None,
    loss_params: Pytree = None,
    stage_aux: Pytree = None,
) -> tuple:
    """One-forward-one-backward (1F1B) pipelined **training step**.

    The schedule of PipeDream-Flush (Narayanan et al. 2021) / the
    Megatron-LM non-interleaved pipeline (Narayanan et al.,
    "Efficient Large-Scale Language Model Training", 2021), expressed
    as one SPMD ``lax.scan`` — no per-stage programs, no send/recv
    framework, cotangents on the reverse ``ppermute``.

    GPipe (``pipeline_forward`` + AD) runs all T microbatch forwards,
    then all T backwards: every stage holds O(T) live residuals. 1F1B
    starts each microbatch's backward as soon as the last stage has its
    loss, so live state is bounded by pipeline *depth*, not microbatch
    count. AD cannot produce that schedule from a forward-only program —
    the loss must live inside the pipelined timeline — so this is an
    explicit-VJP training primitive rather than a forward to wrap in
    ``jax.grad``:

    * step ``n``, stage ``s`` runs the **forward** of microbatch
      ``n - s`` (the GPipe wavefront) *and* the **backward** of
      microbatch ``n - (2S - 2 - s)`` (the reflected wavefront);
    * the last stage computes ``loss_fn`` and its cotangent in the same
      step as the microbatch's forward, seeding the backward wave;
    * cotangents ride the reverse ``ppermute``; each stage accumulates
      its own parameter grads locally (they come back sharded over
      ``stage_axis``, exactly the ``stage_params`` layout);
    * stage inputs are saved in a ring buffer of ``2S`` slots and the
      stage is re-linearized at backward time (``jax.vjp`` recompute —
      the rematerialization 1F1B implementations pair with the
      schedule). In-flight microbatches at stage s are
      ``2(S-1-s) ≤ 2S-2 < 2S``, so a slot is never clobbered live —
      **memory is O(S), independent of T** (GPipe: O(T)).

    ``loss_fn(y_mb, tgt_mb) -> scalar`` must be a *sum*-style loss
    (total = Σ over microbatches); normalize outside. Returns
    ``(total_loss, stage_grads, dx)`` where ``stage_grads`` matches
    ``stage_params`` and ``dx`` is the cotangent w.r.t. ``x`` (so the
    pipelined block can sit mid-model: feed ``dx`` to the upstream
    backward). Pair with ``split_layers_into_stages`` /
    ``scan_layers`` like the GPipe path. DP composes via ``data_axis``
    (grads all-reduced over it, like any DP program).

    ``loss_params``: trainable parameters of the post-pipeline part of
    the model — for a staged encoder-style model the last stage's
    ``loss_fn(loss_params, y_mb, tgt_mb)`` is "decoder + heads + set
    loss" applied per-microbatch, which is exactly what lets the
    backward wave start before all forwards finish. When given, a
    fourth output carries their gradient (replicated; accumulated at
    the last stage, one microbatch at a time).

    ``stage_aux``: non-differentiable per-stage side inputs (leading
    dim = n_stages on every leaf, like ``stage_params``) — dropout RNG
    keys are the canonical case. When given, the stage signature is
    ``stage_fn(params_i, aux_i, a)``. Aux rides OUTSIDE the vjp, so
    integer leaves (PRNG keys) never produce float0 tangents, and the
    backward re-linearization replays the exact same aux — dropout
    masks are identical in forward and recompute, which is what makes
    training with dropout exact.
    """
    n_stages = mesh.shape[stage_axis]
    S, T = n_stages, n_micro
    K = 2 * S  # ring-buffer slots; in-flight ≤ 2S-2 (see docstring)
    N = T + 2 * S - 2  # scan steps: fill + stream + reflected drain
    leaves = jax.tree.leaves(x)
    b = leaves[0].shape[0]
    assert b % T == 0, (b, T)
    mb = b // T

    def microbatch(tree, pad):
        out = jax.tree.map(
            lambda a: a.reshape(T, mb, *a.shape[1:]), tree
        )
        if pad:
            # Schedule-aligned: entry n is consumed at step n (stage 0
            # input) or step n (last-stage target, which sees microbatch
            # n - (S-1) — so targets get S-1 leading dummy entries).
            lead, tail = pad
            out = jax.tree.map(
                lambda a: jnp.concatenate(
                    [jnp.zeros((lead,) + a.shape[1:], a.dtype), a,
                     jnp.zeros((tail,) + a.shape[1:], a.dtype)], axis=0
                ),
                out,
            )
        return out
    xs_sched = microbatch(x, (0, N - T))          # stage-0 feed at step n
    tgt_sched = microbatch(targets, (S - 1, N - T - (S - 1)))

    def per_stage(params, aux, lp, xs_sched, tgt_sched):
        p = jax.tree.map(lambda a: a[0], params)  # this stage's params
        if stage_aux is None:
            fn = stage_fn
        else:
            aux_i = jax.tree.map(lambda a: a[0], aux)
            fn = lambda pp_, xx: stage_fn(pp_, aux_i, xx)
        s_idx = jax.lax.axis_index(stage_axis)
        is_last = s_idx == S - 1
        fwd_perm = [(i, i + 1) for i in range(S - 1)]
        bwd_perm = [(i, i - 1) for i in range(1, S)]

        zero_act = jax.tree.map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), xs_sched
        )
        # Ring buffer: garbage writes (inactive steps) always land in
        # slots whose real write is still in the future, or whose read
        # already happened — proven by the slot arithmetic above.
        buf0 = jax.tree.map(
            lambda a: jnp.zeros((K,) + a.shape, a.dtype), zero_act
        )
        gp0 = jax.tree.map(jnp.zeros_like, p)
        glp0 = jax.tree.map(jnp.zeros_like, lp)

        def step(carry, inputs):
            fwd_prev, bwd_prev, buf, gp, glp, loss_sum = carry
            x_t, tgt_t, n = inputs

            # ---- forward wave: microbatch t_f = n - s ----
            recv_f = jax.lax.ppermute(fwd_prev, stage_axis, fwd_perm)
            t_f = n - s_idx
            inp = jax.tree.map(
                lambda a, r: jnp.where(s_idx == 0, a, r), x_t, recv_f
            )
            out = fn(p, inp)
            slot_f = jnp.mod(t_f, K)
            buf = jax.tree.map(
                lambda bu, v: jax.lax.dynamic_update_index_in_dim(
                    bu, v, slot_f, 0),
                buf, inp,
            )

            # Last stage: loss + cotangent for this step's microbatch
            # (its backward is scheduled THIS step: t_b == t_f there).
            active_f = (t_f >= 0) & (t_f < T)
            if loss_params is None:
                l_t, loss_vjp = jax.vjp(lambda y: loss_fn(y, tgt_t), out)
                (g_y,) = loss_vjp(jnp.ones_like(l_t))
            else:
                l_t, loss_vjp = jax.vjp(
                    lambda lpp, y: loss_fn(lpp, y, tgt_t), lp, out)
                g_lp, g_y = loss_vjp(jnp.ones_like(l_t))
                glp = jax.tree.map(
                    lambda acc, g: acc + jnp.where(
                        is_last & active_f, g, 0),
                    glp, g_lp,
                )
            loss_sum = loss_sum + jnp.where(is_last & active_f, l_t, 0.0)

            # ---- backward wave: microbatch t_b = n - (2S - 2 - s) ----
            recv_b = jax.lax.ppermute(bwd_prev, stage_axis, bwd_perm)
            t_b = n - (2 * S - 2 - s_idx)
            active_b = (t_b >= 0) & (t_b < T)
            slot_b = jnp.mod(t_b, K)
            x_saved = jax.tree.map(
                lambda bu: jax.lax.dynamic_index_in_dim(
                    bu, slot_b, 0, keepdims=False),
                buf,
            )
            ct = jax.tree.map(
                lambda gl, r: jnp.where(is_last, gl, r), g_y, recv_b
            )
            _, stage_vjp = jax.vjp(fn, p, x_saved)
            gp_t, gx_t = stage_vjp(ct)
            gp = jax.tree.map(
                lambda acc, g: acc + jnp.where(active_b, g, 0), gp, gp_t
            )
            # dx leaves the pipeline at stage 0 — emit masked here, one
            # psum over the whole stack after the scan (a per-step psum
            # would cost N collective launches for the same bytes).
            dx_t = jax.tree.map(
                lambda g: jnp.where((s_idx == 0) & active_b, g, 0), gx_t
            )
            return (out, gx_t, buf, gp, glp, loss_sum), dx_t

        carry0 = (zero_act, zero_act, buf0, gp0, glp0, jnp.zeros(()))
        (_, _, _, gp, glp, loss_sum), dxs = jax.lax.scan(
            step, carry0,
            (xs_sched, tgt_sched, jnp.arange(N)),
        )
        loss = jax.lax.psum(loss_sum, stage_axis)  # only last stage ≠ 0
        glp = jax.tree.map(
            lambda g: jax.lax.psum(g, stage_axis), glp
        )
        if data_axis:
            loss = jax.lax.psum(loss, data_axis)
            gp = jax.tree.map(
                lambda g: jax.lax.psum(g, data_axis), gp
            )
            glp = jax.tree.map(
                lambda g: jax.lax.psum(g, data_axis), glp
            )
        # Stage 0's dx for microbatch t is emitted at step t + 2S - 2;
        # replicate across stages with one collective for the stack.
        dx = jax.tree.map(
            lambda a: jax.lax.psum(a[2 * S - 2:], stage_axis), dxs
        )
        return loss, jax.tree.map(lambda g: g[None], gp), glp, dx

    spec_x = P(None, data_axis) if data_axis else P()
    loss, grads, loss_grads, dx = shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(stage_axis), P(stage_axis), P(), spec_x, spec_x),
        out_specs=(P(), P(stage_axis), P(), spec_x),
        check_vma=False,
    )(stage_params, stage_aux, loss_params, xs_sched, tgt_sched)
    dx = jax.tree.map(lambda a: a.reshape(b, *a.shape[2:]), dx)
    if loss_params is None:
        return loss, grads, dx
    return loss, grads, dx, loss_grads


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
        n_micro = choose_n_micro(
            jax.tree.leaves(src)[0].shape[0], n_stages,
            mesh.shape[data_axis] if data_axis else 1,
        )
    stage_params = split_layers_into_stages(encoder_layer_params, n_stages)
    return pipeline_forward(
        scan_layers(encoder_layer_apply), stage_params, src, mesh,
        n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
        tp_axis=tp_axis, remat_stage=remat_stage,
    )
