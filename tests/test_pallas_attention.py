"""Fused attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detr_tensorflow_tpu.ops.pallas import flash_attention


@pytest.mark.parametrize(
    "b,lq,lk,h,dh",
    [
        (2, 100, 252, 8, 32),   # decoder cross-attention shape
        (1, 252, 252, 8, 32),   # encoder self-attention shape
        (2, 100, 100, 4, 16),   # decoder self-attention (odd dims)
        (1, 130, 300, 2, 32),   # non-multiple lengths exercise padding
    ],
)
def test_mha_matches_reference(rng, b, lq, lk, h, dh):
    q = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    ours = flash_attention.mha(q, k, v)
    ref = flash_attention.reference_mha(q, k, v)
    assert ours.shape == (b, lq, h, dh)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_mha_inside_model(rng):
    """attn_impl='pallas' produces the same DETR outputs as 'xla'."""
    from detr_tensorflow_tpu.models import DETR

    kwargs = dict(
        num_classes=5, num_queries=6, model_dim=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    m_xla = DETR(attn_impl="xla", **kwargs)
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    out_xla = m_xla.apply(variables, x)
    m_pl = DETR(attn_impl="pallas", **kwargs)
    out_pl = m_pl.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_pl["pred_logits"]), np.asarray(out_xla["pred_logits"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl["pred_boxes"]), np.asarray(out_xla["pred_boxes"]),
        atol=1e-5, rtol=1e-4,
    )


def test_fused_residual_matmul(rng):
    from detr_tensorflow_tpu.ops.pallas import fused_residual

    n, cin, cout = 300, 64, 256
    x = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32)) * 0.1
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(cout,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    identity = jnp.asarray(rng.normal(size=(n, cout)).astype(np.float32))
    out = fused_residual.matmul_bn_residual_relu(x, w, scale, shift, identity, tc=256)
    ref = np.maximum(np.asarray(x) @ np.asarray(w) * np.asarray(scale)
                     + np.asarray(shift) + np.asarray(identity), 0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_fused_residual_backbone_parity(rng):
    from detr_tensorflow_tpu.models import ResNetBackbone

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    base = ResNetBackbone(stage_sizes=(1, 1, 1, 1))
    variables = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(variables, x)
    fused = ResNetBackbone(stage_sizes=(1, 1, 1, 1), fuse_residual=True)
    out = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("lq,lk", [(100, 252), (252, 252), (130, 300)])
def test_mha_key_padding_mask_matches_reference(rng, lq, lk):
    b, h, dh = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    # Ragged valid lengths per batch element (the bucketed-eval shape).
    mask = np.zeros((b, lk), bool)
    mask[0, lk // 2:] = True
    mask[1, lk - 7:] = True
    mask = jnp.asarray(mask)
    ours = flash_attention.mha(q, k, v, key_padding_mask=mask)
    ref = flash_attention.reference_mha(q, k, v, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_mha_gradients_match_reference(rng, with_mask):
    """Custom-VJP backward (flash-style recompute) == XLA autodiff."""
    b, lq, lk, h, dh = 2, 96, 160, 4, 32
    q = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
    k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.zeros((b, lk), bool)
        m[0, 100:] = True
        m[1, 150:] = True
        mask = jnp.asarray(m)
    w = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32))

    def ours_loss(q, k, v):
        return jnp.sum(flash_attention.mha(q, k, v, key_padding_mask=mask) * w)

    def ref_loss(q, k, v):
        return jnp.sum(flash_attention.reference_mha(q, k, v, key_padding_mask=mask) * w)

    g_ours = jax.grad(ours_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


def test_mha_grad_through_model(rng):
    """End-to-end: loss gradient through DETR with attn_impl='pallas'
    (masked bucketed path) matches the XLA model's gradient."""
    from detr_tensorflow_tpu.models import DETR

    kwargs = dict(
        num_classes=5, num_queries=6, model_dim=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        dropout=0.0, backbone_stage_sizes=(1, 1, 1, 1),
    )
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    pm = np.zeros((1, 64, 96), bool)
    pm[:, :48, :64] = True
    pm = jnp.asarray(pm)
    m_xla = DETR(attn_impl="xla", **kwargs)
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    m_pl = DETR(attn_impl="pallas", **kwargs)

    def loss(model, params):
        out = model.apply(
            {"params": params, "frozen": variables["frozen"]}, x, pixel_mask=pm
        )
        return jnp.sum(out["pred_logits"] ** 2) + jnp.sum(out["pred_boxes"])

    g_xla = jax.grad(lambda p: loss(m_xla, p))(variables["params"])
    g_pl = jax.grad(lambda p: loss(m_pl, p))(variables["params"])
    flat_x, _ = jax.tree.flatten(g_xla)
    flat_p, _ = jax.tree.flatten(g_pl)
    for a, b_ in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=2e-3)
