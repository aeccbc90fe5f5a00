"""Multi-host (multi-process) training support.

The reference is strictly single-process ("Multi GPU training comming
soon", reference README.md:135 — SURVEY.md §2.6). This module is the
TPU-native multi-host story: one JAX process per host, all hosts
jit-executing the *same* SPMD program over one global
``jax.sharding.Mesh``; XLA's collectives ride ICI/DCN exactly as in the
single-host case, so ``Trainer``/``make_train_step`` need no changes —
the only genuinely multi-host concerns are (1) runtime initialization,
(2) feeding each process its own slice of the global batch, and
(3) gating host-side side effects (logging, checkpoint writes) to one
process. Each has one helper here.

Verified end-to-end in tests/test_multihost.py: two OS processes x four
virtual CPU devices train the real DETR through ``Trainer`` on one
8-device global mesh, with per-process data shards, and produce
identical losses to the single-process 8-device run — the CPU-simulated
analog of a 2-host TPU slice (SURVEY.md §4 "multi-chip without a
cluster").

Usage (same script on every host):

    from detr_tensorflow_tpu.parallel import multihost

    multihost.initialize(coordinator_address=..., num_processes=N,
                         process_id=rank)      # no-op if N == 1
    mesh = make_mesh(jax.device_count())       # GLOBAL device count
    trainer = Trainer(model, variables, config, mesh=mesh)
    for local_batch in loader(shard=multihost.process_shard(...)):
        batch = multihost.global_batch(local_batch, mesh)
        log = trainer.step(batch)
        if multihost.is_primary():
            print(log)

On real TPU pods ``jax.distributed.initialize()`` auto-discovers the
coordinator from the TPU metadata, so ``initialize()`` with no
arguments is enough; the explicit coordinator/process arguments exist
for CPU/GPU clusters and for tests.

Checkpointing: ``train/checkpoint.py`` uses Orbax, which is multi-host
aware — every process must call save/restore (Orbax coordinates the
barrier internally); pass the same directory on a filesystem all hosts
share.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Any


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Initialize the JAX distributed runtime; no-op for single process.

    Returns True when the distributed runtime was initialized. On TPU
    pods call with no arguments (auto-discovery); elsewhere pass the
    coordinator's ``host:port`` plus this process's rank.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def is_primary() -> bool:
    """True on the process that should own logging/printing."""
    return jax.process_index() == 0


def process_shard(
    n: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """This process's contiguous [start, stop) range of ``n`` examples.

    The data-loader-facing counterpart of ``global_batch``: each process
    reads and augments only its own slice, keeping host work (image
    decode, augmentation — the reference does all of it in one process,
    detr_tf/data/coco.py) sharded alongside the devices. ``n`` must be
    divisible by the process count, mirroring the static-shape batch
    contract everywhere else in the framework.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert n % pc == 0, (n, pc)
    per = n // pc
    return pi * per, (pi + 1) * per


def global_batch(
    local_batch: Pytree,
    mesh: Mesh,
    axis: str = "data",
) -> Pytree:
    """Assemble per-process local batch shards into global jax.Arrays.

    Every leaf's leading dimension is the *local* batch; the returned
    arrays have global leading dimension ``local * process_count``,
    sharded over ``axis`` — exactly what the jitted train step's
    ``in_shardings`` expect, so ``Trainer.step``'s ``shard_batch`` sees
    committed arrays and is a no-op. Single-process: equivalent to
    ``shard_batch`` (still returns committed global arrays).
    """
    pc = jax.process_count()
    sharding = NamedSharding(mesh, P(axis))

    def leaf(x):
        import numpy as np

        x = np.asarray(x)
        gshape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=gshape
        )

    return jax.tree.map(leaf, local_batch)
