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


def test_forward_parity_with_pixel_mask(torch_detr):
    """Padded images + pixel mask (the bucket-eval path) must match torch
    DETR fed the UNPADDED image. This is the guarantee the bucketed eval
    protocol rests on: masked attention + mask-aware positions + per-conv
    validity masking (models/resnet.py) make the padded forward exactly
    reproduce the unpadded one — torch itself runs its backbone over the
    zero-padded canvas and leaks conv halos, so matching the unpadded
    forward is the *stronger* property."""
    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 96, 128, 3)).astype(np.float32)
    # Pad 96x128 -> 128x160 with zeros; valid region marked in the mask.
    padded = np.zeros((1, 128, 160, 3), np.float32)
    padded[:, :96, :128] = img
    mask = np.zeros((1, 128, 160), bool)
    mask[:, :96, :128] = True

    with torch.no_grad():
        t_out = torch_detr(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )

    variables = convert_torch_detr(
        torch_detr.state_dict(), scheme="hf",
        num_encoder_layers=2, num_decoder_layers=2,
    )
    model = DETR(
        num_classes=92, num_encoder_layers=2, num_decoder_layers=2, dropout=0.0
    )
    out = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(padded),
        pixel_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_out.pred_boxes.numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_out.logits.numpy(), atol=3e-3, rtol=1e-3
    )


def test_facebook_scheme_conversion(torch_detr):
    """Rename the hf state_dict into facebookresearch naming (packing
    q/k/v into in_proj) and check the facebook converter path produces
    the identical pytree."""
    sd = torch_detr.state_dict()
    fb = {}
    bb = "model.backbone.conv_encoder.model"
    for k, v in sd.items():
        if k.startswith(f"{bb}.embedder.embedder.convolution"):
            fb["backbone.0.body.conv1.weight"] = v
        elif k.startswith(f"{bb}.embedder.embedder.normalization"):
            fb[k.replace(f"{bb}.embedder.embedder.normalization", "backbone.0.body.bn1")] = v
        elif k.startswith(f"{bb}.encoder.stages."):
            rest = k[len(f"{bb}.encoder.stages."):]
            s, rest = rest.split(".", 1)
            assert rest.startswith("layers.")
            b, rest = rest[len("layers."):].split(".", 1)
            prefix = f"backbone.0.body.layer{int(s) + 1}.{b}"
            if rest.startswith("layer."):
                j, rest2 = rest[len("layer."):].split(".", 1)
                name = "conv" if rest2.startswith("convolution") else "bn"
                suffix = rest2.split(".", 1)[1]
                fb[f"{prefix}.{name}{int(j) + 1}.{suffix}"] = v
            else:  # shortcut
                assert rest.startswith("shortcut.")
                rest2 = rest[len("shortcut."):]
                idx = "0" if rest2.startswith("convolution") else "1"
                suffix = rest2.split(".", 1)[1]
                fb[f"{prefix}.downsample.{idx}.{suffix}"] = v
    # transformer: pack q/k/v
    for side, fb_side in (("encoder", "encoder"), ("decoder", "decoder")):
        for i in range(2):
            hp = f"model.{side}.layers.{i}"
            fp = f"transformer.{side}.layers.{i}"
            attns = [("self_attn", "self_attn")]
            if side == "decoder":
                attns.append(("encoder_attn", "multihead_attn"))
            for h_attn, f_attn in attns:
                fb[f"{fp}.{f_attn}.in_proj_weight"] = torch.cat(
                    [sd[f"{hp}.{h_attn}.{p}_proj.weight"] for p in "qkv"], dim=0
                )
                fb[f"{fp}.{f_attn}.in_proj_bias"] = torch.cat(
                    [sd[f"{hp}.{h_attn}.{p}_proj.bias"] for p in "qkv"], dim=0
                )
                fb[f"{fp}.{f_attn}.out_proj.weight"] = sd[f"{hp}.{h_attn}.out_proj.weight"]
                fb[f"{fp}.{f_attn}.out_proj.bias"] = sd[f"{hp}.{h_attn}.out_proj.bias"]
            for h_name, f_name in (
                ("fc1", "linear1"), ("fc2", "linear2"),
                ("self_attn_layer_norm", "norm1"),
            ):
                for suf in ("weight", "bias"):
                    fb[f"{fp}.{f_name}.{suf}"] = sd[f"{hp}.{h_name}.{suf}"]
            if side == "encoder":
                for suf in ("weight", "bias"):
                    fb[f"{fp}.norm2.{suf}"] = sd[f"{hp}.final_layer_norm.{suf}"]
            else:
                for suf in ("weight", "bias"):
                    fb[f"{fp}.norm2.{suf}"] = sd[f"{hp}.encoder_attn_layer_norm.{suf}"]
                    fb[f"{fp}.norm3.{suf}"] = sd[f"{hp}.final_layer_norm.{suf}"]
    for suf in ("weight", "bias"):
        fb[f"transformer.decoder.norm.{suf}"] = sd[f"model.decoder.layernorm.{suf}"]
        fb[f"input_proj.{suf}"] = sd[f"model.input_projection.{suf}"]
        fb[f"class_embed.{suf}"] = sd[f"class_labels_classifier.{suf}"]
        for j in range(3):
            fb[f"bbox_embed.layers.{j}.{suf}"] = sd[f"bbox_predictor.layers.{j}.{suf}"]
    fb["query_embed.weight"] = sd["model.query_position_embeddings.weight"]

    from_fb = convert_torch_detr(fb, scheme="auto", num_encoder_layers=2,
                                 num_decoder_layers=2)
    from_hf = convert_torch_detr(sd, scheme="hf", num_encoder_layers=2,
                                 num_decoder_layers=2)
    a = jax.tree.leaves(from_fb)
    b = jax.tree.leaves(from_hf)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


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


def test_resnet101_converter_shapes():
    """DETR-R101: converted facebook-named tree matches a fresh init."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    sd = {}
    sd["backbone.0.body.conv1.weight"] = t(64, 3, 7, 7)
    for suf, shape in (("weight", (64,)), ("bias", (64,)),
                       ("running_mean", (64,)), ("running_var", (64,))):
        sd[f"backbone.0.body.bn1.{suf}"] = t(*shape)
    dims = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    for s, n_blocks in enumerate((3, 4, 23, 3)):
        d1, d2 = dims[s]
        in_ch = 64 if s == 0 else dims[s - 1][1]
        for b in range(n_blocks):
            p = f"backbone.0.body.layer{s + 1}.{b}"
            cin = in_ch if b == 0 else d2
            sd[f"{p}.conv1.weight"] = t(d1, cin, 1, 1)
            sd[f"{p}.conv2.weight"] = t(d1, d1, 3, 3)
            sd[f"{p}.conv3.weight"] = t(d2, d1, 1, 1)
            for j, ch in ((1, d1), (2, d1), (3, d2)):
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.bn{j}.{suf}"] = t(ch)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t(d2, cin, 1, 1)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{p}.downsample.1.{suf}"] = t(d2)
    for side, n in (("encoder", 1), ("decoder", 1)):
        for i in range(n):
            p = f"transformer.{side}.layers.{i}"
            attns = ["self_attn"] + (["multihead_attn"] if side == "decoder" else [])
            for a in attns:
                sd[f"{p}.{a}.in_proj_weight"] = t(768, 256)
                sd[f"{p}.{a}.in_proj_bias"] = t(768)
                sd[f"{p}.{a}.out_proj.weight"] = t(256, 256)
                sd[f"{p}.{a}.out_proj.bias"] = t(256)
            sd[f"{p}.linear1.weight"] = t(2048, 256)
            sd[f"{p}.linear1.bias"] = t(2048)
            sd[f"{p}.linear2.weight"] = t(256, 2048)
            sd[f"{p}.linear2.bias"] = t(256)
            norms = ["norm1", "norm2"] + (["norm3"] if side == "decoder" else [])
            for nm in norms:
                sd[f"{p}.{nm}.weight"] = t(256)
                sd[f"{p}.{nm}.bias"] = t(256)
    sd["transformer.decoder.norm.weight"] = t(256)
    sd["transformer.decoder.norm.bias"] = t(256)
    sd["input_proj.weight"] = t(256, 2048, 1, 1)
    sd["input_proj.bias"] = t(256)
    sd["query_embed.weight"] = t(100, 256)
    sd["class_embed.weight"] = t(92, 256)
    sd["class_embed.bias"] = t(92)
    for j, (i_dim, o_dim) in enumerate(((256, 256), (256, 256), (256, 4))):
        sd[f"bbox_embed.layers.{j}.weight"] = t(o_dim, i_dim)
        sd[f"bbox_embed.layers.{j}.bias"] = t(o_dim)

    converted = convert_torch_detr(
        sd, scheme="facebook", backbone_depth=101,
        num_encoder_layers=1, num_decoder_layers=1,
    )
    model = DETR(num_classes=92, backbone_depth=101,
                 num_encoder_layers=1, num_decoder_layers=1)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), converted)
    assert ref_shapes == got_shapes


@pytest.fixture(scope="module")
def torch_detr_seg():
    """Random-weight HF DetrForSegmentation (panoptic head) — validates
    the mask_head/bbox_attention converter + MaskHead forward parity.
    Mirrors facebook's DETRsegm (models/segmentation.py cites both)."""
    from transformers import DetrConfig, DetrForSegmentation, ResNetConfig

    bb = ResNetConfig(
        out_features=["stage1", "stage2", "stage3", "stage4"]
    )
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
    torch.manual_seed(3)
    model = DetrForSegmentation(cfg).eval()
    sd = model.state_dict()
    g = torch.Generator().manual_seed(4)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize("size", [(96, 128), (100, 148)])
def test_segmentation_forward_parity(torch_detr_seg, size):
    """Full-stack panoptic parity: detector outputs AND per-query mask
    logits must match HF DetrForSegmentation given the converted
    checkpoint (joint heads+space softmax, split-lay1 trick, FPN fusion,
    GroupNorm trunk). 100x148 exercises non-exact stage ratios
    (148: 19->10 at stride 8->16) where the trunk upsample must use
    torch's floor index mapping (ADVICE r2)."""
    rng = np.random.default_rng(11)
    img = rng.normal(size=(2, *size, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = torch_detr_seg(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )

    variables = convert_torch_detr(
        torch_detr_seg.state_dict(), scheme="auto",
        num_encoder_layers=2, num_decoder_layers=2,
    )
    model = DETR(
        num_classes=92, num_encoder_layers=2, num_decoder_layers=2,
        dropout=0.0, masks=True,
    )
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))

    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_out.pred_boxes.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_out.logits.numpy(),
        atol=2e-3, rtol=1e-3,
    )
    t_masks = t_out.pred_masks.numpy()  # (B, Q, H/4, W/4)
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), t_masks, atol=5e-3, rtol=1e-3,
    )
