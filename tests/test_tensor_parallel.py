"""Tensor parallelism: sharded transformer == replicated numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.ops.losses import detr_loss
from detr_tensorflow_tpu.parallel import make_mesh, shard_params, detr_param_shardings
from detr_tensorflow_tpu.train import Trainer, TrainingConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs simulated multi-device CPU"
)


def _model():
    return DETR(
        num_classes=5, num_queries=6, model_dim=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=2, dim_feedforward=64,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )


def _batch(rng, b=4):
    boxes = np.zeros((b, 6, 4), np.float32)
    classes = np.zeros((b, 6), np.int32)
    mask = np.zeros((b, 6), bool)
    boxes[:, :2] = rng.uniform(0.3, 0.7, size=(b, 2, 4))
    classes[:, :2] = rng.integers(1, 4, size=(b, 2))
    mask[:, :2] = True
    return {
        "images": jnp.asarray(rng.normal(size=(b, 32, 32, 3)).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes),
        "mask": jnp.asarray(mask),
    }


def test_shardings_assign_model_axis():
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh(4, axis_names=("data", "model"), axis_sizes=(1, 4))
    sh = detr_param_shardings(variables["params"], mesh)
    enc = sh["transformer"]["encoder_layer_0"]
    assert enc["linear1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert enc["linear2"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert enc["self_attn"]["q_proj"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert enc["self_attn"]["out_proj"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    # replicated elsewhere
    assert sh["backbone"]["conv1"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert sh["class_embed"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tp_forward_and_grads_match_replicated(rng):
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    batch = _batch(rng)

    def loss_fn(params):
        out = model.apply({"params": params, "frozen": variables["frozen"]},
                          batch["images"], train=False)
        total, _ = detr_loss(out, batch["boxes"], batch["classes"], batch["mask"], 0)
        return total

    loss_ref, grads_ref = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])

    mesh = make_mesh(4, axis_names=("data", "model"), axis_sizes=(1, 4))
    sharded = shard_params(variables["params"], mesh)
    loss_tp, grads_tp = jax.jit(jax.value_and_grad(loss_fn))(sharded)

    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(grads_ref)),
                    jax.tree.leaves(jax.device_get(grads_tp))):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_tp_plus_dp_train_step_runs(rng):
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh(8, axis_names=("data", "model"), axis_sizes=(2, 4))
    config = TrainingConfig(
        background_class=0, train_backbone=True, train_transformers=True,
        target_batch=None,
    )
    trainer = Trainer(model, variables, config, mesh=mesh)
    losses = [float(trainer.step(_batch(rng))["total_loss"]) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    # params actually sharded on the model axis
    k = trainer.state.params["transformer"]["encoder_layer_0"]["linear1"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_tp_eval_step_runs(rng):
    model = _model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    mesh = make_mesh(4, axis_names=("data", "model"), axis_sizes=(1, 4))
    config = TrainingConfig(background_class=0)
    trainer = Trainer(model, variables, config, mesh=mesh)
    out, log = trainer.evaluate(_batch(rng))
    assert np.isfinite(float(log["total_loss"]))
    assert out["pred_logits"].shape == (4, 6, 5)
