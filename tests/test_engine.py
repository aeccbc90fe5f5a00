"""Training engine: optimizer groups, accumulation, DP mesh, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.train import (
    TrainingConfig,
    Trainer,
    save_checkpoint,
    restore_latest,
)
from detr_tensorflow_tpu.train import optimizers as opt_lib
from detr_tensorflow_tpu.parallel import make_mesh


def _tiny_model(head="detr", **kw):
    defaults = dict(
        num_classes=5, num_queries=6, model_dim=16, num_heads=2,
        num_encoder_layers=1, num_decoder_layers=2, dim_feedforward=32,
        dropout=0.0, head=head, backbone_stage_sizes=(1, 1, 1, 1),
    )
    defaults.update(kw)
    return DETR(**defaults)


def _batch(rng, b=2, h=32, w=32, t=6):
    images = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    boxes = np.zeros((b, t, 4), np.float32)
    classes = np.zeros((b, t), np.int32)
    mask = np.zeros((b, t), bool)
    for i in range(b):
        n = 2
        boxes[i, :n] = rng.uniform(0.3, 0.7, size=(n, 4))
        classes[i, :n] = rng.integers(1, 4, size=(n,))
        mask[i, :n] = True
    return {
        "images": jnp.asarray(images), "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes), "mask": jnp.asarray(mask),
    }


def _init(model, rng_key=0):
    return model.init(jax.random.PRNGKey(rng_key), jnp.zeros((1, 32, 32, 3)))


def test_auto_input_layout_path_matches_plain(rng):
    """The auto-input-layout AOT step (default, single chip) computes
    the identical update to the plain jitted step, one executable per
    batch shape, and prefetch reuses the compiled formats."""
    model = _tiny_model()
    variables = _init(model)
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        target_batch=None, backbone_lr=1e-3, transformers_lr=1e-3,
    )
    t_auto = Trainer(model, variables, config)
    t_plain = Trainer(
        model, variables, config.replace(auto_input_layout=False)
    )
    assert t_auto._auto_layout and not t_plain._auto_layout

    b1, b2 = _batch(rng), _batch(rng, h=48, w=32)
    for b in (b1, b2, b1):
        la = t_auto.step(b)
        lp = t_plain.step(b)
        np.testing.assert_allclose(
            float(la["total_loss"]), float(lp["total_loss"]), rtol=1e-6
        )
    # one executable per shape, reused across repeats
    assert t_auto.compile_count == 2, t_auto.compile_count
    # params advanced identically through the AOT path
    for a, p in zip(
        jax.tree.leaves(jax.device_get(t_auto.state.params)),
        jax.tree.leaves(jax.device_get(t_plain.state.params)),
    ):
        np.testing.assert_allclose(a, p, atol=1e-6)
    # prefetch peeks the cached formats without compiling anything new
    host = {k: np.asarray(v) for k, v in _batch(rng).items()}
    out = list(t_auto.prefetch(iter([host]), depth=1))
    assert len(out) == 1
    t_auto.step(out[0])
    assert t_auto.compile_count == 2


def test_param_labels_partition():
    model = _tiny_model(head="finetune", nb_class=4)
    variables = _init(model)
    labels = opt_lib.param_labels(variables["params"])
    assert labels["backbone"]["conv1"]["kernel"] == "backbone"
    assert labels["input_proj"]["kernel"] == "backbone"
    flat = jax.tree.leaves(labels["transformer"])
    assert all(v == "transformers" for v in flat)
    assert labels["cls_layer"]["kernel"] == "nlayers"
    assert jax.tree.leaves(labels["pos_layer"])[0] == "nlayers"


def test_loss_decreases_training_all(rng):
    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        target_batch=None, backbone_lr=1e-3, transformers_lr=1e-3,
    )
    trainer = Trainer(model, _init(model), config)
    batch = _batch(rng)
    losses = [float(trainer.step(batch)["total_loss"]) for _ in range(12)]
    assert losses[-1] < losses[0], losses


def test_frozen_groups_do_not_move(rng):
    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_backbone=False, train_transformers=True,
        target_batch=None,
    )
    trainer = Trainer(model, _init(model), config)
    bb_before = jax.device_get(trainer.state.params["backbone"])
    tr_before = jax.device_get(trainer.state.params["transformer"])
    for _ in range(3):
        trainer.step(_batch(rng))
    bb_after = jax.device_get(trainer.state.params["backbone"])
    tr_after = jax.device_get(trainer.state.params["transformer"])
    for a, b in zip(jax.tree.leaves(bb_before), jax.tree.leaves(bb_after)):
        np.testing.assert_array_equal(a, b)
    moved = any(
        np.abs(a - b).max() > 0
        for a, b in zip(jax.tree.leaves(tr_before), jax.tree.leaves(tr_after))
    )
    assert moved


def test_gradient_accumulation_applies_every_k(rng):
    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_transformers=True, batch_size=2, target_batch=4,
    )
    assert config.gradient_aggregate == 2
    trainer = Trainer(model, _init(model), config)
    p0 = jax.device_get(trainer.state.params["transformer"])
    batch = _batch(rng)
    trainer.step(batch)  # microstep 1: no apply yet
    p1 = jax.device_get(trainer.state.params["transformer"])
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
    trainer.step(batch)  # microstep 2: update applied
    p2 = jax.device_get(trainer.state.params["transformer"])
    moved = any(
        np.abs(a - b).max() > 0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p2))
    )
    assert moved


def test_lr_change_no_retrace(rng):
    model = _tiny_model()
    config = TrainingConfig(background_class=0, train_transformers=True, target_batch=None)
    trainer = Trainer(model, _init(model), config)
    batch = _batch(rng)
    trainer.step(batch)
    compiles_before = trainer.train_step._cache_size()
    trainer.set_learning_rates(transformers=3e-4)
    trainer.step(batch)
    assert trainer.train_step._cache_size() == compiles_before


def test_data_parallel_matches_single_device(rng):
    # The DP invariant: loss and gradients computed over a batch sharded
    # across the mesh (psum over ICI) equal the single-device big batch.
    # (Post-Adam parameter deltas are NOT compared: the first Adam step is
    # ~sign(g)*lr, which amplifies benign reduction-order noise.)
    if len(jax.devices()) < 4:
        pytest.skip("needs simulated multi-device CPU")
    from detr_tensorflow_tpu.ops.losses import detr_loss
    from detr_tensorflow_tpu.parallel import mesh as mesh_lib

    model = _tiny_model()
    variables = _init(model)
    batch = _batch(rng, b=4)

    def loss_fn(params, batch):
        out = model.apply({"params": params, "frozen": variables["frozen"]},
                          batch["images"], train=False)
        total, _ = detr_loss(out, batch["boxes"], batch["classes"],
                             batch["mask"], 0)
        return total

    grad_fn = jax.value_and_grad(loss_fn)
    loss_a, grads_a = jax.jit(grad_fn)(variables["params"], batch)

    mesh = make_mesh(4)
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    sharded_fn = jax.jit(grad_fn, in_shardings=(repl, data),
                         out_shardings=(repl, repl))
    loss_b, grads_b = sharded_fn(
        jax.device_put(variables["params"], repl),
        mesh_lib.shard_batch(batch, mesh),
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(grads_a)),
                    jax.tree.leaves(jax.device_get(grads_b))):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    # And the full train step runs end-to-end on the mesh.
    config = TrainingConfig(
        background_class=0, train_transformers=True, train_backbone=True,
        target_batch=None,
    )
    t_mesh = Trainer(model, variables, config, mesh=mesh)
    log = t_mesh.step(batch)
    assert np.isfinite(float(log["total_loss"]))


def test_eval_step_runs(rng):
    model = _tiny_model()
    config = TrainingConfig(background_class=0)
    trainer = Trainer(model, _init(model), config)
    out, log = trainer.evaluate(_batch(rng))
    assert np.isfinite(float(log["total_loss"]))
    assert out["pred_logits"].shape == (2, 6, 5)


def test_checkpoint_roundtrip(rng, tmp_path):
    model = _tiny_model()
    config = TrainingConfig(background_class=0, train_transformers=True, target_batch=None)
    trainer = Trainer(model, _init(model), config)
    trainer.step(_batch(rng))
    trainer.step(_batch(rng))
    path_dir = str(tmp_path / "ckpt")
    save_checkpoint(trainer.state, path_dir)

    other = Trainer(model, _init(model, rng_key=9), config)
    restored = restore_latest(other.state, path_dir)
    assert restored is not None
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree.leaves(jax.device_get(trainer.state.params)),
        jax.tree.leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)


def test_staged_unfreeze(rng):
    # finetune_voc.py:90-96 pattern: heads-only first, then transformers.
    model = _tiny_model(head="finetune", nb_class=4)
    config = TrainingConfig(
        background_class=0, train_nlayers=True, target_batch=None, nlayers_lr=1e-3
    )
    trainer = Trainer(model, _init(model), config)
    batch = _batch(rng)
    trainer.step(batch)
    tr_p0 = jax.device_get(trainer.state.params["transformer"])
    trainer.set_trainable(train_transformers=True)
    trainer.set_learning_rates(transformers=1e-4, nlayers=1e-4)
    trainer.step(batch)
    tr_p1 = jax.device_get(trainer.state.params["transformer"])
    moved = any(
        np.abs(a - b).max() > 0
        for a, b in zip(jax.tree.leaves(tr_p0), jax.tree.leaves(tr_p1))
    )
    assert moved
    assert int(trainer.state.step) == 2  # step counter survives the rebuild


def test_fit_periodic_checkpointing(rng, tmp_path):
    from detr_tensorflow_tpu.train import fit, latest_step

    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_transformers=True, target_batch=None,
        checkpoint_dir=str(tmp_path / "ckpts"),
    )
    trainer = Trainer(model, _init(model), config)
    batches = [_batch(rng) for _ in range(4)]
    fit(trainer, batches, config, epoch_nb=0, checkpoint_every=2)
    # steps 2 and 4 snapshotted; latest is 4
    assert latest_step(config.checkpoint_dir) == 4


def test_fit_preemption_checkpoint_and_stop(rng, tmp_path):
    """SIGTERM mid-epoch: fit saves a final checkpoint and returns False
    (preempted); without a signal it returns True."""
    import os
    import signal

    from detr_tensorflow_tpu.train import fit, latest_step

    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_transformers=True, target_batch=None,
        checkpoint_dir=str(tmp_path / "ckpts"),
    )
    trainer = Trainer(model, _init(model), config)

    def batches_with_signal(n, signal_at):
        for i in range(n):
            if i == signal_at:
                os.kill(os.getpid(), signal.SIGTERM)
            yield _batch(rng)

    completed = fit(trainer, batches_with_signal(6, 2), config, epoch_nb=0)
    assert completed is False
    # The signal fires while the prefetcher produces batch 2; the guard
    # check runs right after the next completed step, so the epoch stops
    # well short of 6 steps and the snapshot matches the live step.
    steps_done = int(trainer.state.step)
    assert 1 <= steps_done < 6
    assert latest_step(config.checkpoint_dir) == steps_done

    # default handlers restored; a clean epoch completes and returns True
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
    completed = fit(trainer, [_batch(rng) for _ in range(2)], config, epoch_nb=1)
    assert completed is True
    assert int(trainer.state.step) == steps_done + 2


def test_data_parallel_train_step_with_masks(rng):
    """The segmentation train step (focal+dice in the loss) runs on a
    data-parallel mesh with the target masks batch-sharded alongside."""
    if len(jax.devices()) < 4:
        pytest.skip("needs simulated multi-device CPU")
    model = _tiny_model(masks=True)
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        train_nlayers=True, target_batch=None,
    )
    mesh = make_mesh(4)
    trainer = Trainer(model, _init(model), config, mesh=mesh)
    batch = _batch(rng, b=4)
    t_masks = np.zeros((4, 6, 8, 8), np.uint8)
    t_masks[:, :2, 2:6, 2:6] = 1
    batch = dict(batch, t_masks=jnp.asarray(t_masks))
    log = trainer.step(batch)
    assert np.isfinite(float(log["mask_loss"]))
    assert np.isfinite(float(log["dice_loss"]))
    assert np.isfinite(float(log["total_loss"]))

    # DP invariant for the mask terms: sharded == single-device values.
    single = Trainer(model, _init(model), config)
    log_s = single.step(jax.device_get(batch))
    np.testing.assert_allclose(
        float(log["mask_loss"]), float(log_s["mask_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(log["dice_loss"]), float(log_s["dice_loss"]), rtol=1e-4
    )


def test_elastic_resume_across_mesh_sizes(rng, tmp_path):
    """Elastic recovery: a run checkpointed on an 8-device DP mesh
    resumes on a 4-device mesh (and vice versa) with identical params
    and step — the single-host elastic story: Orbax stores the logical
    (unsharded) state, so restore just re-replicates onto whatever mesh
    the restarted job has. Losses after resume match a never-restarted
    run bit-for-bit."""
    from detr_tensorflow_tpu.parallel import make_mesh

    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_transformers=True, target_batch=None,
        batch_size=8,
    )
    batch = _batch(np.random.default_rng(0), b=8)

    mesh8 = make_mesh(8)
    t8 = Trainer(model, _init(model), config, mesh=mesh8)
    t8.step(batch)
    t8.step(batch)
    path_dir = str(tmp_path / "ckpt")
    save_checkpoint(t8.state, path_dir)
    ref_log = t8.step(batch)  # the continuation a resume must reproduce

    # "Preempted, restarted with half the devices":
    mesh4 = make_mesh(4)
    t4 = Trainer(model, _init(model, rng_key=9), config, mesh=mesh4)
    restored = restore_latest(t4.state, path_dir)
    assert restored is not None and int(restored.step) == 2
    # Restored params are BITWISE the checkpointed ones (the meaningful
    # elastic invariant; after further optimizer steps 8- vs 4-shard
    # psum reduction orders compound through Adam, so only the loss is
    # compared post-step).
    ckpt_params = jax.device_get(restore_latest(t8.state, path_dir).params)
    for a, b in zip(
        jax.tree.leaves(ckpt_params),
        jax.tree.leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)
    from detr_tensorflow_tpu.parallel import replicate

    t4.state = replicate(restored, mesh4)
    resumed_log = t4.step(batch)
    np.testing.assert_allclose(
        float(resumed_log["total_loss"]), float(ref_log["total_loss"]),
        rtol=1e-6,
    )


def test_multi_scale_train_step_across_shapes(rng):
    """Multi-scale training: the jitted step retraces per image shape
    (one cached XLA program per ladder rung) while optimizer state and
    step count flow through unchanged — donation must not pin the state
    to one program's layout."""
    model = _tiny_model()
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        target_batch=None, backbone_lr=1e-3, transformers_lr=1e-3,
    )
    trainer = Trainer(model, _init(model), config)
    losses = []
    for h, w in ((32, 32), (48, 32), (32, 32), (48, 32)):
        log = trainer.step(_batch(rng, h=h, w=w))
        losses.append(float(log["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(trainer.state.step) == 4
