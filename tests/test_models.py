"""Model block shape/behavior tests (output contract from SURVEY.md §3.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detr_tensorflow_tpu.models import (
    DETR,
    MultiHeadAttention,
    Transformer,
    ResNetBackbone,
    sine_position_embedding,
    as_aux_list,
)


def _tiny_detr(**kw):
    defaults = dict(
        num_classes=7,
        num_queries=10,
        model_dim=32,
        num_heads=4,
        num_encoder_layers=2,
        num_decoder_layers=3,
        dim_feedforward=64,
        dropout=0.0,
        backbone_stage_sizes=(1, 1, 1, 1),
    )
    defaults.update(kw)
    return DETR(**defaults)


def test_sine_position_embedding_matches_closed_form():
    # Fully valid 1x3x4 mask, num_pos_features=4 -> known cumsum coords.
    mask = jnp.ones((1, 3, 4))
    pos = np.asarray(sine_position_embedding(mask, num_pos_features=4))
    assert pos.shape == (1, 3, 4, 8)
    scale = 2 * np.pi
    # y coordinate at row r: (r+1)/(3+1e-6)*scale; feature 0 is sin(y/t^0)
    for r in range(3):
        y = (r + 1) / (3 + 1e-6) * scale
        np.testing.assert_allclose(pos[0, r, 0, 0], np.sin(y), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pos[0, r, 0, 1], np.cos(y), rtol=1e-5, atol=1e-5)
    # x features occupy the second half
    for c in range(4):
        x = (c + 1) / (4 + 1e-6) * scale
        np.testing.assert_allclose(pos[0, 0, c, 4], np.sin(x), rtol=1e-5, atol=1e-5)


def test_mha_shapes_and_mask(rng):
    mha = MultiHeadAttention(model_dim=32, num_heads=4)
    q = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), q, kv, kv)
    out = mha.apply(params, q, kv, kv)
    assert out.shape == (2, 5, 32)

    # Masking the last 4 keys must equal running on the first 5 keys only.
    mask = jnp.zeros((2, 9), bool).at[:, 5:].set(True)
    masked = mha.apply(params, q, kv, kv, key_padding_mask=mask)
    short = mha.apply(params, q, kv[:, :5], kv[:, :5])
    np.testing.assert_allclose(np.asarray(masked), np.asarray(short), atol=1e-5)

    # need_weights path: head-averaged attention sums to 1 over keys.
    out2, w = mha.apply(params, q, kv, kv, return_weights=True)
    assert w.shape == (2, 5, 9)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_resnet_backbone_stride32(rng):
    bb = ResNetBackbone(stage_sizes=(1, 1, 1, 1))
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(0), x)
    y = bb.apply(variables, x)
    assert y.shape == (1, 2, 3, 2048)
    assert "frozen" in variables  # BN stats live outside params


def test_resnet_dilation_keeps_resolution(rng):
    bb = ResNetBackbone(stage_sizes=(1, 1, 1, 1), replace_stride_with_dilation=(False, False, True))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(0), x)
    y = bb.apply(variables, x)
    assert y.shape == (1, 4, 4, 2048)  # stride 16 instead of 32


def test_transformer_output_stack(rng):
    tr = Transformer(model_dim=32, num_heads=4, num_encoder_layers=2,
                     num_decoder_layers=3, dim_feedforward=64, dropout=0.0)
    src = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    qe = jnp.asarray(rng.normal(size=(10, 32)).astype(np.float32))
    params = tr.init(jax.random.PRNGKey(0), src, pos, qe)
    hs, memory = tr.apply(params, src, pos, qe)
    assert hs.shape == (3, 2, 10, 32)
    assert memory.shape == (2, 12, 32)


@pytest.mark.parametrize("head,extra", [("detr", {}), ("finetune", {"nb_class": 4})])
def test_detr_forward_contract(rng, head, extra):
    model = _tiny_detr(head=head, **extra)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    n_cls = 7 if head == "detr" else 4
    assert out["pred_logits"].shape == (2, 10, n_cls)
    assert out["pred_boxes"].shape == (2, 10, 4)
    assert out["aux_logits"].shape == (2, 2, 10, n_cls)  # L-1 aux layers
    assert out["aux_boxes"].shape == (2, 2, 10, 4)
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()  # sigmoid head

    listed = as_aux_list(out)
    assert len(listed["aux"]) == 2


def test_detr_headless(rng):
    model = _tiny_detr(head="none")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["hs"].shape == (3, 1, 10, 32)
    assert out["memory"].shape == (1, 2, 2, 32)


def test_detr_mask_vs_no_mask(rng):
    # An all-valid explicit mask must reproduce the default path.
    model = _tiny_detr()
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(variables, x)
    out2 = model.apply(variables, x, pixel_mask=jnp.ones((1, 64, 64), bool))
    np.testing.assert_allclose(
        np.asarray(out1["pred_logits"]), np.asarray(out2["pred_logits"]), atol=1e-5
    )


def test_detr_dropout_rng_training(rng):
    model = _tiny_detr(dropout=0.1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(out1["pred_logits"]) - np.asarray(out2["pred_logits"])).max() > 1e-6


def test_stem_space_to_depth_equivalence(rng):
    from detr_tensorflow_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    stem = StemConv(use_s2d=True)
    params = stem.init(jax.random.PRNGKey(0), x)
    fast = stem.apply(params, x)
    direct = StemConv(use_s2d=False).apply(params, x)
    assert fast.shape == direct.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(direct), atol=2e-5)

    # odd sizes fall back to the direct path
    x_odd = jnp.asarray(rng.normal(size=(1, 63, 95, 3)).astype(np.float32))
    out = stem.apply(params, x_odd)
    ref = StemConv(use_s2d=False).apply(params, x_odd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_remat_matches_baseline(rng):
    model = _tiny_detr()
    model_r = _tiny_detr(remat=True)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    out_r = model_r.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_r["pred_logits"]), np.asarray(out["pred_logits"]), atol=1e-5
    )
    # gradients flow through the rematerialized layers identically
    def loss(m, v):
        return m.apply(v, x)["pred_boxes"].sum()
    g = jax.grad(lambda v: loss(model, v))(variables)["params"]
    g_r = jax.grad(lambda v: loss(model_r, v))(variables)["params"]
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stem_s2d_auto_training_equivalence(rng):
    """stem_s2d='auto' routes training calls through the S2D stem:
    outputs match the direct conv within fp-reassociation tolerance,
    and inference calls are bit-identical to stem_s2d=False (same
    program)."""
    model = _tiny_detr()  # stem_s2d="auto" default
    model_off = _tiny_detr(stem_s2d=False)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    # inference: identical program either way
    np.testing.assert_array_equal(
        np.asarray(model.apply(variables, x)["pred_logits"]),
        np.asarray(model_off.apply(variables, x)["pred_logits"]),
    )
    # training: S2D vs direct conv — same math, fp reassociation only
    kw = dict(train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, x, **kw)["pred_logits"]),
        np.asarray(model_off.apply(variables, x, **kw)["pred_logits"]),
        atol=2e-4,
    )
    # odd spatial sizes fall back to the direct conv (no crash)
    x_odd = jnp.asarray(rng.normal(size=(1, 33, 35, 3)).astype(np.float32))
    v2 = model.init(jax.random.PRNGKey(0), x_odd)
    out = model.apply(v2, x_odd, **kw)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_backbone_remat_matches_baseline(rng):
    """backbone_remat: identical params tree, bit-identical forward,
    matching gradients (it only changes what the backward recomputes) —
    with and without a pixel mask."""
    model = _tiny_detr()
    model_r = _tiny_detr(backbone_remat=2)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables_r = model_r.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(variables_r)

    pm = jnp.ones((1, 32, 32), bool).at[:, 24:, :].set(False)
    for mask in (None, pm):
        out = model.apply(variables, x, pixel_mask=mask)
        out_r = model_r.apply(variables, x, pixel_mask=mask)
        np.testing.assert_array_equal(
            np.asarray(out_r["pred_logits"]), np.asarray(out["pred_logits"])
        )

    def loss(m, v):
        return m.apply(v, x)["pred_boxes"].sum()

    g = jax.grad(lambda v: loss(model, v))(variables)["params"]
    g_r = jax.grad(lambda v: loss(model_r, v))(variables)["params"]
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
