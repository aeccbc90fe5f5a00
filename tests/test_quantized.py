"""int8 quantized-inference path: Pallas conv kernel exactness, PTQ
calibrate/quantize/forward fidelity, exact bucket-padding invariance in
the quant domain, and DETR(backbone_quant=True) integration.

(The reference has no quantization capability — fp32 TF2 throughout;
SURVEY.md §6. This subsystem is the measured int8 bandwidth lever from
docs/performance.md.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detr_tensorflow_tpu.models import DETR
from detr_tensorflow_tpu.models import quantized as Q
from detr_tensorflow_tpu.models.resnet import ResNetBackbone
from detr_tensorflow_tpu.ops.pallas.int8_conv import (
    conv3x3_int8,
    reference_conv3x3_int8,
)


class TestInt8ConvKernel:
    @pytest.mark.parametrize("relu", [False, True])
    @pytest.mark.parametrize("out_dtype", [jnp.int8, jnp.bfloat16])
    def test_integer_exact_vs_xla(self, rng, relu, out_dtype):
        """The tap-decomposed kernel is bit-exact vs an int32 XLA conv
        through the identical requant epilogue."""
        x = jnp.asarray(rng.integers(-128, 128, (2, 13, 20, 32), np.int8))
        w = jnp.asarray(rng.integers(-128, 128, (3, 3, 32, 64), np.int8))
        s = jnp.asarray(rng.uniform(1e-4, 1e-2, 64).astype(np.float32))
        b = jnp.asarray(rng.normal(size=64).astype(np.float32))
        got = conv3x3_int8(x, w, s, b, relu=relu, out_dtype=out_dtype)
        ref = reference_conv3x3_int8(x, w, s, b, relu=relu,
                                     out_dtype=out_dtype)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    def test_saturating_boundaries(self, rng):
        """Accumulators large enough to clip both rails."""
        x = jnp.full((1, 9, 9, 128), 127, jnp.int8)
        w = jnp.asarray(
            rng.choice(np.array([-127, 127], np.int8), (3, 3, 128, 8))
        )
        s = jnp.full((8,), 1e-3, jnp.float32)
        got = conv3x3_int8(x, w, s, relu=False, out_dtype=jnp.int8)
        ref = reference_conv3x3_int8(x, w, s, relu=False, out_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert int(np.asarray(got).max()) == 127
        assert int(np.asarray(got).min()) == -128

    def test_odd_height_padding(self, rng):
        """H not divisible by row_chunk exercises the padded-row path."""
        x = jnp.asarray(rng.integers(-128, 128, (1, 11, 16, 8), np.int8))
        w = jnp.asarray(rng.integers(-128, 128, (3, 3, 8, 8), np.int8))
        s = jnp.full((8,), 1e-2, jnp.float32)
        got = conv3x3_int8(x, w, s, row_tile=8)
        ref = reference_conv3x3_int8(x, w, s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.fixture(scope="module")
def tiny_backbone():
    rng = np.random.default_rng(0)
    model = ResNetBackbone(stage_sizes=(2, 2, 2, 2))
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), img))
    # Non-trivial BN statistics so the folding is actually exercised.
    variables["frozen"] = jax.tree.map(
        lambda x: jnp.asarray(
            rng.normal(size=x.shape).astype(np.float32) * 0.1 + 1.0
        ),
        variables["frozen"],
    )
    return model, variables, img


class TestPTQBackbone:
    def test_fidelity_vs_fp32(self, tiny_backbone):
        model, variables, img = tiny_backbone
        ref = np.asarray(model.apply(variables, img))
        calib = Q.calibrate_backbone(variables, img, stage_sizes=(2, 2, 2, 2))
        qt = Q.quantize_backbone(variables, calib, stage_sizes=(2, 2, 2, 2))
        out = np.asarray(
            Q.quant_backbone_forward(
                qt, img, stage_sizes=(2, 2, 2, 2), compute_dtype=jnp.float32
            ),
            np.float32,
        )
        assert out.shape == ref.shape
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        # Random weights are the PTQ worst case; the bound is loose but
        # catches any structural error (wrong scale, misfolded BN, ...).
        assert rel < 0.10, rel
        assert corr > 0.99, corr

    def test_exact_padding_invariance(self, tiny_backbone):
        """Bucket padding + pixel mask in the int8 domain is *bit-exact*:
        zero-point 0 makes zeroed conv inputs exact, and requantization
        rounds identical values identically."""
        model, variables, img = tiny_backbone
        calib = Q.calibrate_backbone(variables, img, stage_sizes=(2, 2, 2, 2))
        qt = Q.quantize_backbone(variables, calib, stage_sizes=(2, 2, 2, 2))
        out = np.asarray(
            Q.quant_backbone_forward(
                qt, img, stage_sizes=(2, 2, 2, 2),
                compute_dtype=jnp.float32,
            )
        )
        pad = jnp.zeros((2, 96, 96, 3), jnp.float32).at[:, :64, :64].set(img)
        mask = jnp.zeros((2, 96, 96), bool).at[:, :64, :64].set(True)
        outp = np.asarray(
            Q.quant_backbone_forward(
                qt, pad, stage_sizes=(2, 2, 2, 2), pixel_mask=mask,
                compute_dtype=jnp.float32,
            )
        )[:, :2, :2]
        np.testing.assert_array_equal(outp, out)

    def test_interm_contract(self, tiny_backbone):
        model, variables, img = tiny_backbone
        qv = Q.quantize_model(variables, img, stage_sizes=(2, 2, 2, 2))
        c5, interm = Q.quant_backbone_forward(
            qv["quant"]["backbone"], img, stage_sizes=(2, 2, 2, 2),
            return_interm=True, compute_dtype=jnp.float32,
        )
        assert set(interm) == {"c2", "c3", "c4"}
        assert interm["c2"].shape == (2, 16, 16, 256)
        assert interm["c3"].shape == (2, 8, 8, 512)
        assert interm["c4"].shape == (2, 4, 4, 1024)
        assert c5.shape == (2, 2, 2, 2048)

    def test_dilated_dc5_geometry(self, tiny_backbone):
        """DC5: layer4 keeps stride-16 resolution; the dilated 3x3 takes
        the XLA int32 fallback path."""
        _, variables, img = tiny_backbone
        calib = Q.calibrate_backbone(
            variables, img, stage_sizes=(2, 2, 2, 2), dilation=True
        )
        qt = Q.quantize_backbone(
            variables, calib, stage_sizes=(2, 2, 2, 2), dilation=True
        )
        out = Q.quant_backbone_forward(
            qt, img, stage_sizes=(2, 2, 2, 2), dilation=True,
            compute_dtype=jnp.float32,
        )
        assert out.shape == (2, 4, 4, 2048)
        ref = ResNetBackbone(
            stage_sizes=(2, 2, 2, 2),
            replace_stride_with_dilation=(False, False, True),
        ).apply(variables, img)
        rel = (
            np.abs(np.asarray(out) - np.asarray(ref)).mean()
            / np.abs(np.asarray(ref)).mean()
        )
        assert rel < 0.10, rel


class TestDetrIntegration:
    def test_backbone_quant_forward(self, rng):
        kw = dict(
            num_classes=7, num_queries=10, model_dim=32, num_heads=4,
            num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
            dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
        )
        img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        fp32 = DETR(**kw)
        variables = dict(fp32.init(jax.random.PRNGKey(0), img))
        ref = fp32.apply(variables, img)

        qv = Q.quantize_model(variables, img, stage_sizes=(1, 1, 1, 1))
        out = DETR(**kw, backbone_quant=True).apply(qv, img)
        assert out["pred_logits"].shape == ref["pred_logits"].shape
        assert out["pred_boxes"].shape == ref["pred_boxes"].shape
        # Backbone PTQ noise propagates through the transformer; demand
        # agreement, not equality.
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"]), np.asarray(ref["pred_boxes"]),
            atol=0.08,
        )

    def test_missing_quant_collection_raises(self, rng):
        kw = dict(
            num_classes=7, num_queries=10, model_dim=32, num_heads=4,
            num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
            dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
        )
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        fp32 = DETR(**kw)
        variables = dict(fp32.init(jax.random.PRNGKey(0), img))
        with pytest.raises(Exception):
            DETR(**kw, backbone_quant=True).apply(variables, img)


def test_backbone_quant_with_masks(rng):
    """The int8 backbone's dequantized c2-c4 interm maps feed the
    segmentation FPN head: DETR(masks=True, backbone_quant=True) runs
    and produces mask logits of the right shape."""
    kw = dict(
        num_classes=7, num_queries=10, model_dim=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1), masks=True,
    )
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    fp32 = DETR(**kw)
    variables = dict(fp32.init(jax.random.PRNGKey(0), img))
    qv = Q.quantize_model(variables, img, stage_sizes=(1, 1, 1, 1))
    out = DETR(**kw, backbone_quant=True).apply(qv, img)
    assert out["pred_masks"].shape == (1, 10, 16, 16)
    ref = fp32.apply(variables, img)
    # PTQ noise flows through attention maps + FPN; demand coherence.
    corr = np.corrcoef(
        np.asarray(out["pred_masks"]).ravel(),
        np.asarray(ref["pred_masks"]).ravel(),
    )[0, 1]
    assert corr > 0.9, corr


def test_pick_row_tile_rules():
    """Auto row tiles: largest multiple-of-8 divisor of padded H, capped
    at 32 (larger element-window tiles crash this env's Mosaic AOT)."""
    from detr_tensorflow_tpu.ops.pallas.int8_conv import _pick_row_tile

    assert _pick_row_tile(200) == 8       # 200 = 8 x 25
    assert _pick_row_tile(104) == 8
    assert _pick_row_tile(56) == 8
    assert _pick_row_tile(32) == 32
    assert _pick_row_tile(96) == 32
    assert _pick_row_tile(48) == 24


def test_qmatmul_nondivisible_m(rng):
    """M not divisible by the tile: padded rows must not leak into the
    valid output."""
    from detr_tensorflow_tpu.ops.pallas.int8_matmul import qmatmul

    x = jnp.asarray(rng.integers(-128, 128, (3, 5, 7, 16), np.int8))  # M=105
    w = jnp.asarray(rng.integers(-128, 128, (16, 8), np.int8))
    s = jnp.full((8,), 1e-2, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    got = qmatmul(x, w, s, b, m_tile=32)
    acc = jnp.einsum("bhwc,ck->bhwk", x.astype(np.int32), w.astype(np.int32))
    ref = jnp.clip(jnp.round(jnp.maximum(acc * s + b, 0)), -128, 127
                   ).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fast_epilogue_within_one_lsb(rng):
    """precise=False (bf16 epilogue, round-half-up) stays within 1 LSB
    of the bit-exact f32 epilogue."""
    from detr_tensorflow_tpu.ops.pallas.int8_matmul import qmatmul

    x = jnp.asarray(rng.integers(-128, 128, (64, 32), np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (32, 48), np.int8))
    s = jnp.asarray(rng.uniform(1e-4, 1e-2, 48).astype(np.float32))
    b = jnp.asarray(rng.normal(size=48).astype(np.float32))
    fast = np.asarray(qmatmul(x, w, s, b, precise=False, m_tile=32), np.int32)
    prec = np.asarray(qmatmul(x, w, s, b, precise=True, m_tile=32), np.int32)
    assert np.abs(fast - prec).max() <= 1
