"""Elastic training demo — a worker dies mid-run, training survives.

Runs a 2-process training job under the ``ElasticLauncher``
(parallel/elastic.py) on one machine, no TPUs needed: each worker owns
4 virtual CPU devices; ``jax.distributed`` ties them into one 8-device
mesh. Rank 1 simulates a preempted host at step 3; the launcher tears
the generation down and relaunches rank 0 alone as a 1-process world,
which restores the step-3 checkpoint and finishes — the recovery loop
a real pod runs when a host is lost.

Usage:
    python examples/elastic_train.py              # watch it recover
    python examples/elastic_train.py --steps 8
"""

import argparse
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(ckpt_dir: str, steps: int, die_at: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from detr_tensorflow_tpu.parallel import elastic, make_mesh, multihost

    ctx = elastic.initialize_from_env()
    tag = f"[gen {ctx.generation} rank {ctx.rank}/{ctx.world}]"
    print(f"{tag} joined: {jax.device_count()} devices", flush=True)

    import jax.numpy as jnp
    import numpy as np

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.parallel import replicate
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig
    from detr_tensorflow_tpu.train.checkpoint import (
        restore_latest, save_checkpoint)

    mesh = make_mesh(jax.device_count())
    model = DETR(
        num_classes=8, num_queries=6, model_dim=16, num_heads=2,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        backbone_stage_sizes=(1, 1, 1, 1), dropout=0.0,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    config = TrainingConfig(
        background_class=7, train_backbone=True, train_transformers=True,
        train_nlayers=True, batch_size=8, target_batch=8,
    )
    trainer = Trainer(model, variables, config, mesh=mesh)

    restored = restore_latest(trainer.state, ckpt_dir)
    if restored is not None:
        trainer.state = replicate(restored, mesh)
        print(f"{tag} resumed from step {int(trainer.state.step)}",
              flush=True)

    rng = np.random.default_rng(0)
    full = {
        "images": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "boxes": np.clip(rng.uniform(0.2, 0.8, (8, 6, 4)), 0.05, 0.95)
            .astype(np.float32),
        "classes": np.ones((8, 6), np.int32),
        "mask": np.tile([True, True, False, False, False, False], (8, 1)),
    }
    lo, hi = multihost.process_shard(8)
    local = {k: v[lo:hi] for k, v in full.items()}

    while int(trainer.state.step) < steps:
        log = trainer.step(multihost.global_batch(local, mesh))
        step = int(trainer.state.step)
        if multihost.is_primary():
            print(f"{tag} step {step}: "
                  f"loss={float(jax.device_get(log['total_loss'])):.4f}",
                  flush=True)
        save_checkpoint(jax.device_get(trainer.state), ckpt_dir, step=step)
        if (ctx.generation == 0 and ctx.rank == ctx.world - 1
                and step == die_at):
            print(f"{tag} simulating lost host (os._exit)", flush=True)
            os._exit(17)
    print(f"{tag} done at step {int(trainer.state.step)}", flush=True)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--die_at", type=int, default=3)
    parser.add_argument("--worker", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--ckpt_dir", default=None, help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.worker:
        worker(args.ckpt_dir, args.steps, args.die_at)
        return 0

    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    ckpt_dir = tempfile.mkdtemp(prefix="detr_tpu_elastic_")
    env = {"PYTHONPATH": _REPO + os.pathsep
           + os.environ.get("PYTHONPATH", ""),
           "PALLAS_AXON_POOL_IPS": None, "XLA_FLAGS": None}
    run = ElasticLauncher(
        [sys.executable, "-u", os.path.abspath(__file__), "--worker",
         "--ckpt_dir", ckpt_dir, "--steps", str(args.steps),
         "--die_at", str(args.die_at)],
        n_processes=2, min_processes=1, max_restarts=2, env=env,
        cwd=_REPO,
    ).run()

    for g in run.generations:
        status = "completed" if g.ok else f"lost ranks {g.failed_ranks}"
        print(f"\n=== generation {g.generation}: world={g.world} "
              f"{status} ===")
        for r, out in enumerate(g.outputs):
            for line in out.splitlines():
                if line.startswith("["):
                    print(" ", line)
    print(f"\nelastic run: {'SUCCESS' if run.success else 'FAILED'} "
          f"(final world {run.final_world})")
    return 0 if run.success else 1


if __name__ == "__main__":
    sys.exit(main())
