"""Multi-host training demo — runnable on one machine, no TPUs needed.

Launches N worker processes (default 2), each owning 4 virtual CPU
devices; ``jax.distributed`` ties them into one global 8-device mesh
and the real DETR trains through the ordinary ``Trainer`` with
per-process data shards (parallel/multihost.py). On an actual TPU pod
the *worker body below is the whole program* — run it once per host
with ``multihost.initialize()`` (auto-discovery) and drop the
simulation flags.

Usage:
    python examples/multihost_train.py            # coordinator+workers
    python examples/multihost_train.py --steps 5
"""

import argparse
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(rank: int, nproc: int, port: int, steps: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from detr_tensorflow_tpu.parallel import make_mesh, multihost

    multihost.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=rank
    )

    import jax.numpy as jnp
    import numpy as np

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig

    mesh = make_mesh(jax.device_count())
    model = DETR(
        num_classes=8, num_queries=8, model_dim=32, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2, dim_feedforward=64,
        backbone_stage_sizes=(1, 1, 1, 1), dropout=0.1,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        train_nlayers=True, batch_size=8, target_batch=8,
        transformers_lr=1e-3,
    )
    trainer = Trainer(model, variables, config, mesh=mesh)

    # Synthetic dataset; each process reads only its own slice, the way
    # a real loader would consume multihost.process_shard's range.
    rng = np.random.default_rng(0)
    global_b = 8
    full = {
        "images": rng.normal(size=(global_b, 64, 64, 3)).astype(np.float32),
        "boxes": np.clip(
            rng.uniform(0.2, 0.8, (global_b, 8, 4)), 0.05, 0.95
        ).astype(np.float32),
        "classes": np.ones((global_b, 8), np.int32),
        "mask": np.tile([True, True] + [False] * 6, (global_b, 1)),
    }
    lo, hi = multihost.process_shard(global_b)
    local = {k: v[lo:hi] for k, v in full.items()}

    for step in range(steps):
        log = trainer.step(multihost.global_batch(local, mesh))
        if multihost.is_primary():
            print(
                f"step {step}: total_loss="
                f"{float(jax.device_get(log['total_loss'])):.4f}",
                flush=True,
            )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--nproc", type=int, default=2)
    parser.add_argument("--rank", type=int, default=None,
                        help="(internal) worker rank")
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args()

    if args.rank is not None:  # worker invocation
        worker(args.rank, args.nproc, args.port, args.steps)
        return

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU simulation
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--rank", str(i), "--nproc", str(args.nproc),
             "--port", str(port), "--steps", str(args.steps)],
            cwd=_REPO, env=env,
        )
        for i in range(args.nproc)
    ]
    rc = [p.wait() for p in procs]
    assert rc == [0] * args.nproc, rc
    print("multihost demo: all workers exited cleanly")


if __name__ == "__main__":
    main()
