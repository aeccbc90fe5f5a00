"""Elastic orchestration (parallel/elastic.py): a 2-process training
job loses a worker mid-run; the launcher detects the death, tears the
generation down, and relaunches the survivor as a 1-process world that
restores the latest checkpoint and finishes — the lost-host recovery
loop ROADMAP #5 scoped (the reference is single-process with no
failure handling at all, SURVEY.md §5).

The worker is a REAL training script: tiny DETR through the real
Trainer on a global mesh (4 virtual CPU devices per process, Gloo
collectives — the CPU analog of per-host TPU slices), checkpointing
every step via train/checkpoint.py. Rank 1 of generation 0 simulates a
preempted host with os._exit after step 3's checkpoint barrier; the
relaunched world-1 generation must resume at step 3 and train to
step 6.
"""

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
ckpt_dir = sys.argv[1]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from detr_tensorflow_tpu.parallel import elastic, make_mesh, multihost

ctx = elastic.initialize_from_env()
assert ctx is not None
print(f"GEN {ctx.generation} RANK {ctx.rank} WORLD {ctx.world}",
      flush=True)

import jax.numpy as jnp
import numpy as np
from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.parallel import replicate
from detr_tensorflow_tpu.train import Trainer, TrainingConfig
from detr_tensorflow_tpu.train.checkpoint import (
    restore_latest, save_checkpoint)

mesh = make_mesh(jax.device_count())  # 8 at world 2, 4 at world 1
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
    print(f"RESUMED {int(trainer.state.step)}", flush=True)

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

while int(trainer.state.step) < 6:
    log = trainer.step(multihost.global_batch(local, mesh))
    step = int(trainer.state.step)
    print(f"LOSS {step} {float(jax.device_get(log['total_loss'])):.6f}",
          flush=True)
    # Every process participates in the save (Orbax's multi-host
    # contract); the write barrier doubles as the crash sync point.
    save_checkpoint(jax.device_get(trainer.state), ckpt_dir, step=step)
    if ctx.generation == 0 and ctx.rank == ctx.world - 1 and step == 3:
        print("DYING", flush=True)
        os._exit(17)  # simulated host loss (after step 3's barrier)
print("DONE", flush=True)
"""


def test_lost_worker_relaunch_resumes(tmp_path):
    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    ckpt_dir = str(tmp_path / "ckpt")

    launcher = ElasticLauncher(
        [sys.executable, "-u", str(worker), ckpt_dir],
        n_processes=2, min_processes=1, max_restarts=2,
        env={
            "PYTHONPATH": _REPO + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
            # Disarm the TPU sitecustomize / inherited XLA flags.
            "PALLAS_AXON_POOL_IPS": None,
            "XLA_FLAGS": None,
        },
        cwd=_REPO,
    )
    run = launcher.run()
    for g in run.generations:
        print(f"--- generation {g.generation} (world {g.world}) "
              f"rcs={g.returncodes} failed={g.failed_ranks}")
    assert run.success, [o[-2000:] for g in run.generations
                         for o in g.outputs]

    assert len(run.generations) == 2
    g0, g1 = run.generations
    assert g0.world == 2 and not g0.ok
    assert g0.failed_ranks == [1]
    assert 17 in [rc for rc in g0.returncodes]
    assert "DYING" in g0.outputs[1]

    assert g1.world == 1 and g1.ok
    assert "RESUMED 3" in g1.outputs[0]
    assert "LOSS 6" in g1.outputs[0]
    assert "DONE" in g1.outputs[0]


def test_from_env_roundtrip(monkeypatch):
    from detr_tensorflow_tpu.parallel import elastic

    monkeypatch.delenv(elastic.ENV_RANK, raising=False)
    assert elastic.from_env() is None
    assert elastic.initialize_from_env() is None

    monkeypatch.setenv(elastic.ENV_COORDINATOR, "127.0.0.1:1234")
    monkeypatch.setenv(elastic.ENV_RANK, "2")
    monkeypatch.setenv(elastic.ENV_WORLD, "4")
    monkeypatch.setenv(elastic.ENV_GENERATION, "1")
    ctx = elastic.from_env()
    assert ctx == elastic.ElasticContext(
        rank=2, world=4, generation=1, coordinator="127.0.0.1:1234")


def test_launcher_success_first_generation(tmp_path):
    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    script = tmp_path / "ok.py"
    script.write_text("print('fine')\n")
    run = ElasticLauncher([sys.executable, str(script)], 2).run()
    assert run.success and len(run.generations) == 1
    assert run.generations[0].ok and run.final_world == 2


def test_hung_worker_treated_as_lost(tmp_path):
    """A worker wedged forever (e.g. in a dead collective) is detected
    by the generation timeout and the survivors relaunch without it."""
    from detr_tensorflow_tpu.parallel import elastic
    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    script = tmp_path / "hang_once.py"
    script.write_text(
        "import os, time\n"
        f"if (os.environ['{elastic.ENV_GENERATION}'] == '0'\n"
        f"        and os.environ['{elastic.ENV_RANK}'] == '1'):\n"
        "    time.sleep(3600)\n"
        "print('fine')\n"
    )
    run = ElasticLauncher(
        [sys.executable, str(script)], 2, min_processes=1,
        max_restarts=1, generation_timeout=20.0, grace=2.0,
    ).run()
    assert run.success
    g0, g1 = run.generations
    assert g0.failed_ranks == [1] and not g0.ok
    assert g1.world == 1 and g1.ok


def test_cli_launcher_smoke(tmp_path):
    """scripts/elastic_launch.py end to end: exit code and summary."""
    import subprocess

    script = tmp_path / "ok.py"
    script.write_text(
        "import os\n"
        "print('rank', os.environ['DETR_ELASTIC_RANK'],\n"
        "      'of', os.environ['DETR_ELASTIC_WORLD'])\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts/elastic_launch.py"),
         "--nprocs", "2", "--", sys.executable, str(script)],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SUCCESS" in out.stdout and "world=2" in out.stdout


def test_launcher_gives_up_after_max_restarts(tmp_path):
    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    # The highest rank dies shortly after start in every generation;
    # the others would run on (and get torn down).
    script = tmp_path / "bad.py"
    script.write_text(
        "import os, sys, time\n"
        "rank, world = (int(os.environ['DETR_ELASTIC_RANK']),\n"
        "               int(os.environ['DETR_ELASTIC_WORLD']))\n"
        "if rank == world - 1:\n"
        "    time.sleep(0.5); sys.exit(3)\n"
        "time.sleep(60)\n"
    )
    run = ElasticLauncher(
        [sys.executable, str(script)], 2, min_processes=1, max_restarts=1,
        grace=2.0,
    ).run()
    assert not run.success
    # initial + one relaunch
    assert len(run.generations) == 2
    assert run.generations[-1].world == 1  # shrunk before the retry


def test_launcher_fails_fast_below_min_processes(tmp_path):
    """Losing more hosts than min_processes allows fails the run
    instead of relaunching a world that cannot satisfy the contract."""
    from detr_tensorflow_tpu.parallel.elastic import ElasticLauncher

    script = tmp_path / "allbad.py"
    script.write_text("import sys, time; time.sleep(0.3); sys.exit(3)\n")
    run = ElasticLauncher(
        [sys.executable, str(script)], 2, min_processes=2, max_restarts=3,
    ).run()
    assert not run.success
    assert len(run.generations) == 1  # no relaunch: 2 - lost < min 2
