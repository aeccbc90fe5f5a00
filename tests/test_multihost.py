"""Multi-host training (parallel/multihost.py): two OS processes, one
global mesh, the REAL DETR through the real Trainer.

Each worker process owns 4 virtual CPU devices; jax.distributed ties
them into one 8-device mesh (Gloo collectives — the CPU analog of a
2-host TPU slice). Both processes must produce identical losses, and
those losses must match the single-process 8-device run of the same
global batch (computed in-process here under tests/conftest.py's own
8-device CPU simulation).

The reference has no multi-process story at all (SURVEY.md §2.6).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from detr_tensorflow_tpu.parallel import make_mesh, multihost

assert multihost.initialize(
    f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
assert jax.local_device_count() == 4 and jax.device_count() == 8
assert multihost.is_primary() == (pid == 0)

import jax.numpy as jnp
import numpy as np
from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.train import Trainer, TrainingConfig

mesh = make_mesh(8)
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

rng = np.random.default_rng(0)
full = {
    "images": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
    "boxes": np.clip(rng.uniform(0.2, 0.8, (8, 6, 4)), 0.05, 0.95)
        .astype(np.float32),
    "classes": np.ones((8, 6), np.int32),
    "mask": np.tile([True, True, False, False, False, False], (8, 1)),
}
lo, hi = multihost.process_shard(8)
assert (lo, hi) == (pid * 4, pid * 4 + 4)
local = {k: v[lo:hi] for k, v in full.items()}

for i in range(3):
    batch = multihost.global_batch(local, mesh)
    log = trainer.step(batch)
    print(f"LOSS {i} {float(jax.device_get(log['total_loss'])):.6f}",
          flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path, rng):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disarm the TPU sitecustomize
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=_REPO, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    def losses(out):
        got = [
            float(line.split()[2])
            for line in out.splitlines()
            if line.startswith("LOSS ")
        ]
        assert len(got) == 3, out[-3000:]
        return got

    l0, l1 = losses(outs[0]), losses(outs[1])
    # Both processes run one SPMD program: identical losses.
    np.testing.assert_array_equal(l0, l1)

    # And they match the single-process 8-device run (this test process,
    # under conftest's 8-device CPU simulation) of the same global batch.
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.models import DETR
    from detr_tensorflow_tpu.parallel import make_mesh
    from detr_tensorflow_tpu.train import Trainer, TrainingConfig

    mesh = make_mesh(8)
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
    data_rng = np.random.default_rng(0)
    full = {
        "images": data_rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "boxes": np.clip(data_rng.uniform(0.2, 0.8, (8, 6, 4)), 0.05, 0.95)
            .astype(np.float32),
        "classes": np.ones((8, 6), np.int32),
        "mask": np.tile([True, True, False, False, False, False], (8, 1)),
    }
    ref = []
    for _ in range(3):
        log = trainer.step(full)
        ref.append(float(jax.device_get(log["total_loss"])))
    np.testing.assert_allclose(l0, ref, rtol=1e-5, atol=1e-6)


def test_process_shard_single_process():
    from detr_tensorflow_tpu.parallel import multihost

    assert multihost.process_shard(8, 0, 1) == (0, 8)
    assert multihost.process_shard(8, 1, 4) == (2, 4)
    with pytest.raises(AssertionError):
        multihost.process_shard(7, 0, 2)


def test_global_batch_single_process(rng):
    """Single-process global_batch == shard_batch (committed arrays)."""
    import jax

    from detr_tensorflow_tpu.parallel import make_mesh, multihost

    mesh = make_mesh(8)
    x = {"a": rng.normal(size=(8, 3)).astype(np.float32)}
    g = multihost.global_batch(x, mesh)
    assert g["a"].shape == (8, 3)
    assert "data" in str(g["a"].sharding.spec)
    np.testing.assert_array_equal(np.asarray(g["a"]), x["a"])
