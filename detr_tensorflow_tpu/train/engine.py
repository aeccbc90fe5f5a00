"""Training engine: one jitted step end to end.

The whole step — forward, vmapped on-device Hungarian matching, set
loss, backward, three-group Adam with per-tensor clipnorm, gradient
accumulation, optional data-parallel all-reduce — is a single XLA
program (the reference splits this across a ``tf.function`` graph, a
host scipy hop per image, and a Python gradient-aggregation loop;
SURVEY.md §3.1). Learning rates are runtime inputs so schedules and
mid-run changes (reference finetune_voc.py:90-96) never retrace.

API parity: ``fit`` / ``eval_loop`` mirror ``training.fit`` /
``training.eval`` (detr_tf/training.py:35-87), including the every-100-
steps console line and the per-group LR logging.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.losses import detr_loss
from ..parallel import mesh as mesh_lib
from . import optimizers as opt_lib

Array = jnp.ndarray


def _has_model_axis(mesh) -> bool:
    return "model" in mesh.axis_names and mesh.shape["model"] > 1


@struct.dataclass
class TrainState:
    params: Any
    frozen: Any
    opt_state: Any
    step: Array
    dropout_rng: Array


def create_train_state(
    model, variables: Dict[str, Any], config, rng: Optional[Array] = None
) -> "tuple[TrainState, optax.GradientTransformation]":
    """Initialize optimizer state from model variables."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # Copy: the jitted train step donates the state, which would
    # invalidate the caller's `variables` buffers on TPU otherwise.
    # One jitted program per tree: un-donated jit outputs are fresh
    # buffers, and a single dispatch avoids hundreds of per-leaf ops
    # through the remote-TPU relay (~0.5s each there).
    copy = jax.jit(lambda tree: jax.tree.map(jnp.asarray, tree))
    params = copy(variables["params"])
    frozen = copy(variables.get("frozen", {}))
    tx = opt_lib.make_optimizer(config, params)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(
        params=params,
        frozen=frozen,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        dropout_rng=rng,
    )
    return state, tx


def _optimizer_tail(state: TrainState, grads, tx, lrs, log):
    """Shared step epilogue: 3-group update scaled by the runtime LRs,
    LR logging, step bump — identical for the AD and 1F1B steps."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = opt_lib.scale_updates_by_lr(updates, lrs)
    params = optax.apply_updates(state.params, updates)
    log = dict(log)
    log["backbone_lr"] = lrs["backbone"]
    log["transformers_lr"] = lrs["transformers"]
    log["nlayers_lr"] = lrs["nlayers"]
    new_state = state.replace(
        params=params, opt_state=opt_state, step=state.step + 1
    )
    return new_state, log


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    mesh=None,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, lrs) -> (state, log).

    batch: {'images': (B,H,W,3), 'boxes': (B,T,4), 'classes': (B,T),
            'mask': (B,T)} — native fixed-slot target layout.
    lrs: {'backbone','transformers','nlayers'} scalar f32 arrays.
    jit=False returns the raw python step function (the Trainer's
    auto-input-layout path re-jits it with AUTO in_shardings).
    """
    background_class = int(config.background_class)
    lap_impl = getattr(config, "lap_impl", "xla")

    def step_fn(state: TrainState, batch, lrs):
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "frozen": state.frozen},
                batch["images"],
                train=True,
                rngs={"dropout": rng},
            )
            total, log = detr_loss(
                out, batch["boxes"], batch["classes"], batch["mask"],
                background_class, t_masks=batch.get("t_masks"),
                lap_impl=lap_impl,
            )
            return total, log

        (total, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        log = dict(log)
        log["total_loss"] = total
        return _optimizer_tail(state, grads, tx, lrs, log)

    if not jit:
        return step_fn
    if mesh is not None and _has_model_axis(mesh):
        # Tensor-parallel (+ optional data-parallel): the state arrives
        # with committed shardings (parallel/tp.py); GSPMD propagates
        # them and inserts the TP all-reduces. No explicit in_shardings.
        return jax.jit(step_fn, donate_argnums=(0,))
    if mesh is not None:
        repl = mesh_lib.replicated_sharding(mesh)
        data = _batch_sharding(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_1f1b_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    mesh,
    *,
    stage_axis: str = "stage",
    data_axis: Optional[str] = None,
    n_micro: Optional[int] = None,
) -> Callable:
    """The Trainer-grade 1F1B step: (state, batch, lrs) -> (state, log).

    Same contract as ``make_train_step`` (3-group optimizer, runtime
    LRs, donated state) but gradients come from the interleaved
    pipeline schedule (``parallel.detr_1f1b.detr_1f1b_value_and_grad``
    — encoder AND decoder layers staged over ``stage_axis`` as one
    slot sequence, O(depth) activation memory, gradients equal to the
    sequential model). The log carries ``total_loss`` + LRs only:
    component attribution would require re-running the loss outside
    the schedule. Dropout trains through the schedule (per-slot keys
    ride with the stages, replayed exactly in the backward
    re-linearization); scope otherwise: head="detr", no masks (those
    route to GPipe — Trainer handles the fallback).
    """
    background_class = int(config.background_class)
    from ..parallel.detr_1f1b import detr_1f1b_value_and_grad

    def step_fn(state: TrainState, batch, lrs):
        total, grads = detr_1f1b_value_and_grad(
            model,
            {"params": state.params, "frozen": state.frozen},
            batch, mesh,
            background_class=background_class,
            n_micro=n_micro, stage_axis=stage_axis, data_axis=data_axis,
            dropout_rng=jax.random.fold_in(state.dropout_rng, state.step),
        )
        return _optimizer_tail(state, grads, tx, lrs,
                               {"total_loss": total})

    repl = mesh_lib.replicated_sharding(mesh)
    data = (
        mesh_lib.batch_sharding(mesh, data_axis) if data_axis else repl
    )
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def _batch_sharding(mesh):
    """Batch placement for a mesh: sharded over 'data' when the mesh
    has that axis, replicated otherwise (e.g. a stage-only 1F1B
    mesh)."""
    if "data" in mesh.axis_names:
        return mesh_lib.batch_sharding(mesh)
    return mesh_lib.replicated_sharding(mesh)


def make_eval_step(model, config, mesh=None) -> Callable:
    """Jitted validation step: (state, batch) -> log (loss metrics)."""
    background_class = int(config.background_class)
    lap_impl = getattr(config, "lap_impl", "xla")

    def step_fn(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "frozen": state.frozen},
            batch["images"],
            train=False,
        )
        total, log = detr_loss(
            out, batch["boxes"], batch["classes"], batch["mask"],
            background_class, t_masks=batch.get("t_masks"),
            lap_impl=lap_impl,
        )
        log = dict(log)
        log["total_loss"] = total
        return out, log

    if mesh is not None and _has_model_axis(mesh):
        return jax.jit(step_fn)
    if mesh is not None:
        repl = mesh_lib.replicated_sharding(mesh)
        data = _batch_sharding(mesh)
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=(data, repl))
    return jax.jit(step_fn)


class Trainer:
    """Stateful convenience wrapper tying model, optimizer, and mesh."""

    def __init__(self, model, variables, config, mesh=None, rng=None,
                 pipeline_1f1b=None):
        """``pipeline_1f1b``: a ``parallel.pp.PipelineSpec`` — train
        through the interleaved 1F1B schedule instead of plain AD (the
        encoder stages over the spec's ``stage_axis``; see
        ``make_1f1b_train_step`` for scope). ``mesh`` defaults to the
        spec's mesh."""
        self.model = model
        self.config = config
        self._pp1f1b = pipeline_1f1b
        if pipeline_1f1b is not None:
            if mesh is not None and mesh != pipeline_1f1b.mesh:
                raise ValueError(
                    "mesh= and pipeline_1f1b.mesh differ; the state and "
                    "the 1F1B step must live on one mesh — pass only "
                    "the spec (its mesh is used)"
                )
            mesh = pipeline_1f1b.mesh
            if getattr(model, "masks", False) or \
                    getattr(model, "head", "detr") != "detr":
                # The explicit-VJP 1F1B schedule covers head="detr"
                # without the segmentation head (parallel/detr_1f1b.py
                # scope); other variants pipeline through the GPipe/AD
                # path on the same mesh instead of raising — identical
                # parameter tree, same staging, O(n_micro) activation
                # memory instead of O(depth).
                import warnings

                warnings.warn(
                    "pipeline_1f1b: model has masks/non-detr head — "
                    "routing to the GPipe pipeline schedule "
                    "(DETR(pipeline=...)); the 1F1B memory bound only "
                    "applies to head='detr' detection models",
                    stacklevel=2,
                )
                self._pp1f1b = None
                self.model = model = model.clone(pipeline=pipeline_1f1b)
        self.mesh = mesh
        self.state, self.tx = create_train_state(model, variables, config, rng)
        if mesh is not None and _has_model_axis(mesh):
            self.state = self._shard_state_tp(self.state, mesh)
        elif mesh is not None:
            self.state = mesh_lib.replicate(self.state, mesh)
        self.train_step = self._make_train_step()
        self.eval_step = make_eval_step(model, config, mesh)
        self._lrs = opt_lib.lr_dict(config)
        # Auto-input-layout path (single chip only): AOT-compile the
        # step per batch shape with compiler-chosen (AUTO) layouts for
        # the data batch, then feed batches already in those layouts —
        # deleting the in-step input relayout copy (measured 0.78 ms of
        # the 24.6 ms b8 train step, docs/performance.md r4). Cache:
        # shape-key -> (executable, input formats) | None (fallback).
        self._aot_cache = {}
        self._auto_layout = (
            bool(getattr(config, "auto_input_layout", True))
            and mesh is None and self._pp1f1b is None
        )

    @staticmethod
    def _shape_key(batch):
        leaves, treedef = jax.tree.flatten(batch)
        return (treedef,
                tuple((tuple(l.shape), str(l.dtype)) for l in leaves))

    def _layout_entry(self, batch):
        """(executable, put_batch) for this batch's shapes, compiled on
        first sight; None = this shape permanently falls back to the
        plain jitted step (e.g. a backend without layout support).

        ``put_batch`` places a batch in the executable's input layouts.
        Preferred: ``jax.device_put(batch, formats)`` — zero device
        work once the host hands over the right layout. Some stacks
        silently IGNORE the layout in device_put (observed on jax
        0.9.0: a batch-minor image layout came back in the transfer
        default, and the AOT call then raises a layout mismatch), so
        the placement is VERIFIED on the example batch; when it does
        not stick, a jitted identity with ``out_shardings=formats``
        does the relayout on device — a tiny bandwidth copy that rides
        the async dispatch (and overlaps fully under ``prefetch``),
        still deleting the in-step relayout. If even that disagrees,
        the entry falls back to None.

        Two stack quirks the relayout path works around (measured on
        chip, docs/performance.md r5): (a) the ``Format`` objects from
        ``compiled.input_formats`` are REBUILT with a concrete
        ``SingleDeviceSharding`` before use as ``out_shardings``; (b)
        the persistent compilation cache mis-keys identity functions
        across different output formats — a cached ``jit identity``
        with stale layouts gets served silently — so the relayout is
        AOT-compiled with the persistent cache disabled and the held
        executable is reused directly.
        """
        key = self._shape_key(batch)
        if key in self._aot_cache:
            return self._aot_cache[key]
        try:
            from jax.experimental.layout import Format, Layout

            raw = make_train_step(
                self.model, self.tx, self.config, None, jit=False
            )
            jfn = jax.jit(
                raw, donate_argnums=(0,),
                in_shardings=(None, Format(Layout.AUTO), None),
            )
            compiled = jfn.lower(self.state, batch, self._lrs).compile()
            fmts = compiled.input_formats[0][1]
            from ..utils.layouts import verified_put

            put_batch = verified_put(fmts, batch)  # raises with detail
            entry = (compiled, put_batch)
        except Exception as e:  # pragma: no cover - backend-specific
            import warnings

            warnings.warn(
                f"auto_input_layout unavailable for this shape "
                f"({type(e).__name__}: {e}); using the default-layout "
                "step", stacklevel=2,
            )
            entry = None
        self._aot_cache[key] = entry
        return entry

    @property
    def compile_count(self) -> int:
        """Compiled train-step programs (one per batch shape)."""
        if self._auto_layout:
            return len(self._aot_cache) + self.train_step._cache_size()
        return self.train_step._cache_size()

    def aot_compiled(self, batch):
        """The executable ``step`` would run for this batch's shapes,
        plus the batch-relayout function — for benches/cost analysis."""
        entry = self._layout_entry(batch) if self._auto_layout else None
        if entry is None:
            compiled = self.train_step.lower(
                self.state, batch, self._lrs
            ).compile()
            return compiled, jax.device_put
        return entry

    def _make_train_step(self):
        if self._pp1f1b is not None:
            spec = self._pp1f1b
            return make_1f1b_train_step(
                self.model, self.tx, self.config, spec.mesh,
                stage_axis=spec.stage_axis, data_axis=spec.data_axis,
                n_micro=spec.n_micro,
            )
        return make_train_step(self.model, self.tx, self.config, self.mesh)

    def _shard_state_tp(self, state: TrainState, mesh) -> TrainState:
        """Commit tensor-parallel shardings: params per parallel/tp.py,
        optimizer state re-initialized under jit so its moments inherit
        the parameter shardings via GSPMD propagation."""
        from ..parallel import tp

        params = tp.shard_params(jax.device_get(state.params), mesh)
        frozen = mesh_lib.replicate(state.frozen, mesh)
        opt_state = jax.jit(self.tx.init)(params)
        return state.replace(
            params=params,
            frozen=frozen,
            opt_state=opt_state,
            step=mesh_lib.replicate(state.step, mesh),
            dropout_rng=mesh_lib.replicate(state.dropout_rng, mesh),
        )

    def set_learning_rates(self, **kw):
        """Adjust LRs mid-run without retracing (e.g. staged unfreeze)."""
        for k, v in kw.items():
            assert k in self._lrs, k
            self._lrs[k] = jnp.asarray(v, jnp.float32)

    def set_trainable(self, **kw):
        """Flip train_{backbone,transformers,nlayers}; rebuilds the
        optimizer (one retrace), preserving params and step."""
        self.config = self.config.replace(**kw)
        tx = opt_lib.make_optimizer(self.config, self.state.params)
        self.tx = tx
        if self.mesh is not None and _has_model_axis(self.mesh):
            # params keep their committed TP shardings; moments inherit.
            opt_state = jax.jit(tx.init)(self.state.params)
            self.state = self.state.replace(opt_state=opt_state)
        else:
            opt_state = tx.init(self.state.params)
            self.state = self.state.replace(opt_state=opt_state)
            if self.mesh is not None:
                self.state = mesh_lib.replicate(self.state, self.mesh)
        self.train_step = self._make_train_step()
        self._lrs = opt_lib.lr_dict(self.config)
        self._aot_cache = {}  # executables bake tx/config: recompile

    def step(self, batch):
        if self.mesh is not None and "data" in self.mesh.axis_names:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        if self._auto_layout:
            entry = self._layout_entry(batch)
            if entry is not None:
                compiled, put_batch = entry
                # No-op when the batch (e.g. from prefetch) already
                # carries the executable's layouts.
                batch = put_batch(batch)
                self.state, log = compiled(self.state, batch, self._lrs)
                return log
        self.state, log = self.train_step(self.state, batch, self._lrs)
        return log

    def prefetch(self, iterator, depth: int = 2):
        """Move batches to device ``depth`` steps ahead of consumption.

        ``device_put`` dispatches asynchronously, so the host->device
        transfer of batch N+1 overlaps the compute of batch N instead of
        serializing in ``step`` (the device-side analog of the
        reference's ``prefetch(32)``, detr_tf/data/coco.py:125).
        ``step``'s own ``shard_batch`` then sees an already-committed
        array and is a no-op.
        """
        import collections

        buf = collections.deque()
        for batch in iterator:
            if self.mesh is not None:
                batch = mesh_lib.shard_batch(batch, self.mesh)
            else:
                # Peek-only layout lookup: once step() has compiled this
                # shape, prefetched batches transfer straight into the
                # executable's layouts (the relayout rides the overlapped
                # host->device copy instead of the step's critical path).
                entry = (self._aot_cache.get(self._shape_key(batch))
                         if self._auto_layout else None)
                batch = (entry[1](batch) if entry
                         else jax.device_put(batch))
            buf.append(batch)
            if len(buf) >= depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def evaluate(self, batch):
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(batch, self.mesh)
        return self.eval_step(self.state, batch)

    @property
    def variables(self):
        return {"params": self.state.params, "frozen": self.state.frozen}


class PreemptionGuard:
    """Graceful-stop watcher for preemptible TPU VMs.

    Installs SIGTERM/SIGINT handlers (in the main thread) that only set a
    flag; ``fit`` checks the flag between steps, writes a final full-state
    checkpoint, and returns cleanly instead of dying mid-step — the
    failure-tolerance story the reference lacks entirely (SURVEY.md §5:
    crashes are fatal there). Preempted runs resume via
    ``checkpoint.restore_latest``.
    """

    def __init__(self):
        self.requested = False
        self._previous = {}

    def __enter__(self):
        import signal

        def handler(signum, frame):
            del frame
            self.requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._previous[sig] = signal.signal(sig, handler)
            except ValueError:  # not the main thread: stay passive
                pass
        return self

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        return False


def fit(trainer: Trainer, train_dataset, config, epoch_nb: int, class_names=None,
        log_fn=None, log_every: int = 100, checkpoint_every: Optional[int] = None,
        preemption_guard: Optional[PreemptionGuard] = None):
    """One epoch over ``train_dataset`` (an iterable of native batches) —
    console cadence mirrors reference training.py:35-65. With
    ``checkpoint_every`` (and ``config.checkpoint_dir``) the full train
    state is snapshotted periodically so a crashed run resumes via
    ``restore_latest`` — failure tolerance the reference lacks
    (SURVEY.md §5: crashes are fatal there). A ``PreemptionGuard`` (an
    externally-entered one, or a fresh one when ``config.checkpoint_dir``
    is set) turns SIGTERM/SIGINT into checkpoint-and-return.

    Returns True if the epoch completed, False if preempted."""
    del class_names
    import contextlib

    own_guard = (
        PreemptionGuard()
        if preemption_guard is None and config.checkpoint_dir
        else None
    )
    guard = preemption_guard or own_guard
    ctx = own_guard if own_guard is not None else contextlib.nullcontext()
    with ctx:
        return _fit_inner(
            trainer, train_dataset, config, epoch_nb, log_fn, log_every,
            checkpoint_every, guard,
        )


def _fit_inner(trainer, train_dataset, config, epoch_nb, log_fn, log_every,
               checkpoint_every, guard):
    # Multi-host: every process steps and checkpoints (Orbax coordinates
    # internally), but only the primary prints (parallel/multihost.py).
    primary = jax.process_index() == 0
    t0 = time.time()
    for epoch_step, batch in enumerate(trainer.prefetch(train_dataset)):
        log = trainer.step(batch)
        if guard is not None and guard.requested:
            if config.checkpoint_dir:
                from .checkpoint import save_checkpoint

                save_checkpoint(trainer.state, config.checkpoint_dir)
                if primary:
                    print(
                        f"Preemption signal received: checkpoint saved at "
                        f"step {int(trainer.state.step)}; stopping epoch "
                        f"{epoch_nb}."
                    )
            return False
        if (
            checkpoint_every
            and config.checkpoint_dir
            and (epoch_step + 1) % checkpoint_every == 0
        ):
            from .checkpoint import save_checkpoint

            save_checkpoint(trainer.state, config.checkpoint_dir)
        if epoch_step % log_every == 0:
            # Materializing floats forces a device sync — do it only on
            # the logging cadence so steps in between stay fully async
            # (reference logs wandb on the same cadence, training.py:49).
            log = jax.device_get(log)
            if log_fn is not None:
                log_fn(
                    {k: float(v) for k, v in log.items()},
                    int(trainer.state.step),
                )
            elapsed = time.time() - t0
            if primary:
                # Component terms are absent from the 1F1B step's log
                # (total-only) — print what the step provides.
                if "label_cost" in log:
                    terms = (
                        f"ce: [{float(log['label_cost']):.2f}] \t "
                        f"giou: [{float(log['giou_loss']):.2f}] \t "
                        f"l1: [{float(log['l1_loss']):.2f}]"
                    )
                else:
                    terms = f"loss: [{float(log['total_loss']):.2f}]"
                print(
                    f"Epoch: [{epoch_nb}], \t Step: [{epoch_step}], \t "
                    f"{terms} \t time: [{elapsed:.2f}]"
                )
            t0 = time.time()
    return True


def eval_loop(trainer: Trainer, valid_dataset, config, class_names=None,
              evaluation_step: int = 200, log_fn=None, visual_log: bool = False):
    """Validation loss loop (reference training.py:68-87). With
    ``visual_log`` (and wandb available), accumulates per-batch mAP and
    box-overlay images exactly like the reference's ``valid_log``
    (logger/training_logging.py:99-106)."""
    primary = jax.process_index() == 0
    logs = []
    for val_step, batch in enumerate(valid_dataset):
        outputs, log = trainer.evaluate(batch)
        if visual_log:
            from ..logger import valid_log as _valid_log

            _valid_log(batch, outputs, config, val_step,
                       int(trainer.state.step), class_names,
                       evaluation_step=evaluation_step)
        logs.append(jax.device_get(log))
        if val_step % 10 == 0 and primary:
            print(
                f"Validation step: [{val_step}], \t "
                f"ce: [{float(log['label_cost']):.2f}] \t "
                f"giou: [{float(log['giou_loss']):.2f}] \t "
                f"l1: [{float(log['l1_loss']):.2f}]"
            )
        if log_fn is not None and val_step == 0:
            log_fn({k: float(v) for k, v in log.items()}, int(trainer.state.step))
        if val_step + 1 >= evaluation_step:
            break
    return logs
