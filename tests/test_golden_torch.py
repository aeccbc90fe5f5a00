"""Golden activation parity vs a torch DETR (HuggingFace implementation,
random weights, CPU). This validates the entire forward stack — frozen-BN
ResNet-50, sine positions, 1x1 projection, 6+6 transformer, class/box
heads — plus the weight converter, without any network access.

(The reference's only analog is re-running COCO eval against a published
AP table, SURVEY.md §4; this is a much tighter per-activation check.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.models.weights import convert_torch_detr


@pytest.fixture(scope="module")
def torch_detr():
    from transformers import DetrConfig, DetrForObjectDetection, ResNetConfig

    bb = ResNetConfig(out_features=["stage4"])
    cfg = DetrConfig(
        use_timm_backbone=False,
        use_pretrained_backbone=False,
        backbone_config=bb,
        num_labels=91,
        encoder_layers=2,
        decoder_layers=2,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = DetrForObjectDetection(cfg).eval()
    # Randomize BN stats so frozen-BN conversion is actually exercised.
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    return model


def test_forward_parity_full_stack(torch_detr):
    rng = np.random.default_rng(42)
    img = rng.normal(size=(2, 96, 128, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = torch_detr(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            output_hidden_states=False,
        )
    t_logits = t_out.logits.numpy()
    t_boxes = t_out.pred_boxes.numpy()

    variables = convert_torch_detr(
        torch_detr.state_dict(), scheme="hf",
        num_encoder_layers=2, num_decoder_layers=2,
    )
    model = DETR(
        num_classes=92, num_encoder_layers=2, num_decoder_layers=2, dropout=0.0
    )
    variables = jax.tree.map(jnp.asarray, variables)
    out = model.apply(variables, jnp.asarray(img))

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_boxes, atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_logits, atol=2e-3, rtol=1e-3
    )


def test_converter_tree_structure(torch_detr):
    variables = convert_torch_detr(
        torch_detr.state_dict(), scheme="auto",
        num_encoder_layers=2, num_decoder_layers=2,
    )
    # auto-sniffing must detect hf naming
    p = variables["params"]
    assert p["query_embed"].shape == (100, 256)
    assert p["input_proj"]["kernel"].shape == (1, 1, 2048, 256)
    assert p["class_embed"]["kernel"].shape == (256, 92)
    assert p["transformer"]["decoder_layer_1"]["cross_attn"]["q_proj"]["kernel"].shape == (256, 256)
    f = variables["frozen"]["backbone"]
    assert f["bn1"]["running_mean"].shape == (64,)
    assert f["layer4"]["block_0"]["downsample_bn"]["running_var"].shape == (2048,)

    # Shapes line up with a fresh init of our module.
    model = DETR(num_classes=92, num_encoder_layers=2, num_decoder_layers=2)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, variables)
    assert ref_shapes == got_shapes
