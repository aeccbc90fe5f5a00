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


class TestKernelDropout:
    """In-kernel attention dropout (counter-based PRNG, backward replay)."""

    def _qkv(self, rng, b=2, lq=128, lk=128, h=2, dh=32):
        mk = lambda l: jnp.asarray(  # noqa: E731
            rng.normal(size=(b, l, h, dh)).astype(np.float32) * 0.5
        )
        return mk(lq), mk(lk), mk(lk)

    def test_zero_rate_identical_to_no_dropout(self, rng):
        from detr_tensorflow_tpu.ops.pallas.flash_attention import mha

        q, k, v = self._qkv(rng)
        base = mha(q, k, v)
        with_seed = mha(q, k, v, dropout_rate=0.0,
                        dropout_seed=jnp.asarray([7], jnp.int32))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(with_seed))

    def test_deterministic_given_seed(self, rng):
        from detr_tensorflow_tpu.ops.pallas.flash_attention import mha

        q, k, v = self._qkv(rng)
        seed = jnp.asarray([123], jnp.int32)
        a = mha(q, k, v, dropout_rate=0.3, dropout_seed=seed)
        b_ = mha(q, k, v, dropout_rate=0.3, dropout_seed=seed)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="Mosaic TPU interpret mode's prng_random_bits returns "
               "zeros (all-keep mask); real PRNG statistics need "
               "hardware — covered by scripts/attn_dropout_probe.py",
    )
    def test_seed_statistics_on_tpu(self, rng):
        from detr_tensorflow_tpu.ops.pallas.flash_attention import (
            mha, reference_mha,
        )

        q, k, v = self._qkv(rng)
        a = mha(q, k, v, dropout_rate=0.3,
                dropout_seed=jnp.asarray([123], jnp.int32))
        # a different seed must give a different draw
        c = mha(q, k, v, dropout_rate=0.3,
                dropout_seed=jnp.asarray([124], jnp.int32))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
        # keep-prob scaling: averaging over many seeds approaches the
        # undropped output (E[mask/keep] = 1)
        acc = np.zeros_like(np.asarray(a))
        n = 24
        for s in range(n):
            acc += np.asarray(mha(
                q, k, v, dropout_rate=0.3,
                dropout_seed=jnp.asarray([s], jnp.int32),
            ))
        ref = np.asarray(reference_mha(q, k, v))
        resid = np.abs(acc / n - ref).mean()
        scale = np.abs(ref).mean()
        assert resid < 0.25 * scale  # ~1/sqrt(24) concentration

    def test_gradients_match_finite_differences(self, rng):
        """For a FIXED seed the kernel is a deterministic smooth function
        of (q, k, v); its custom VJP must agree with numerical
        differentiation — proving the backward replays the forward's
        exact dropout mask."""
        from jax.test_util import check_grads

        from detr_tensorflow_tpu.ops.pallas.flash_attention import mha

        q, k, v = self._qkv(rng, b=1, lq=128, lk=128, h=1, dh=8)
        seed = jnp.asarray([42], jnp.int32)

        def f(q_, k_, v_):
            return jnp.sum(
                mha(q_, k_, v_, dropout_rate=0.25, dropout_seed=seed,
                    q_block=128) ** 2
            )

        check_grads(f, (q, k, v), order=1, modes=["rev"],
                    atol=5e-2, rtol=5e-2)

    def test_model_trains_through_pallas_dropout(self, rng):
        """attn_impl='pallas' with the reference dropout recipe (0.1)
        no longer falls back to XLA: the train step runs and the loss
        is finite (VERDICT r2 item 9)."""
        import flax.linen as nn_

        from detr_tensorflow_tpu.models.transformer import (
            MultiHeadAttention,
        )

        mod = MultiHeadAttention(model_dim=16, num_heads=2, dropout=0.1,
                                 attn_impl="pallas")
        x = jnp.asarray(rng.normal(size=(2, 128, 16)).astype(np.float32))
        variables = mod.init(
            {"params": jax.random.PRNGKey(0)}, x, x, x,
        )

        def loss(p, rng_):
            out = mod.apply({"params": p}, x, x, x, train=True,
                            rngs={"dropout": rng_})
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss)(
            variables["params"], jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(val))
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
        # deterministic path (train=False) ignores dropout entirely
        o1 = mod.apply(variables, x, x, x, train=False)
        o2 = mod.apply(variables, x, x, x, train=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestFusedBottleneck:
    """Whole-block bottleneck fusion (ops/pallas/fused_bottleneck.py):
    parity vs the XLA conv chain, edge masking, BN folding, and the
    model flag (identical parameter tree)."""

    def test_matches_reference_chain(self, rng):
        from detr_tensorflow_tpu.ops.pallas.fused_bottleneck import (
            fused_bottleneck, reference_bottleneck,
        )

        for (n, h, w, c, m) in [(1, 9, 12, 32, 8), (2, 16, 10, 16, 16),
                                (1, 8, 8, 8, 8)]:
            x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32) * 0.5)
            mk = lambda *s: jnp.asarray(  # noqa: E731
                rng.normal(size=s).astype(np.float32) * 0.2
            )
            w1, w2, w3 = mk(1, 1, c, m), mk(3, 3, m, m), mk(1, 1, m, c)
            b1, b2, b3 = mk(m), mk(m), mk(c)
            got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3)
            want = reference_bottleneck(x, w1, b1, w2, b2, w3, b3)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            )

    def test_bias_relu_edge_masking(self, rng):
        """Positive biases make relu(b1) != 0 at out-of-image halo
        positions; the kernel must zero them like the unfused conv2's
        zero padding (the whole point of the in-kernel mask)."""
        from detr_tensorflow_tpu.ops.pallas.fused_bottleneck import (
            fused_bottleneck, reference_bottleneck,
        )

        n, h, w, c, m = 1, 10, 11, 16, 8
        x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.3
        )
        w1, w2, w3 = mk(1, 1, c, m), mk(3, 3, m, m), mk(1, 1, m, c)
        b1 = jnp.full((m,), 2.0)  # large positive: halo leakage would show
        b2, b3 = mk(m), mk(c)
        got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3)
        want = reference_bottleneck(x, w1, b1, w2, b2, w3, b3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
        )

    def test_model_flag_parity_and_param_tree(self, rng):
        """DETR(fuse_bottleneck=True) uses the SAME parameter tree and
        reproduces the XLA model's outputs (bf16-folding tolerance)."""
        from detr_tensorflow_tpu.models import DETR

        kw = dict(
            num_classes=5, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=1, num_decoder_layers=1,
            dim_feedforward=32, dropout=0.0,
            backbone_stage_sizes=(2, 1, 1, 1),  # layer1 has 1 identity block
        )
        m_xla = DETR(**kw)
        m_fused = DETR(**kw, fuse_bottleneck=True)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        variables = m_xla.init(jax.random.PRNGKey(0), x)
        v2 = m_fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
            lambda a: a.shape, v2
        )
        out_x = m_xla.apply(variables, x)
        out_f = m_fused.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_f["pred_logits"]), np.asarray(out_x["pred_logits"]),
            atol=2e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_f["pred_boxes"]), np.asarray(out_x["pred_boxes"]),
            atol=2e-3, rtol=1e-3,
        )


class TestProductionShapes:
    """The kernel at the shapes production actually serves (VERDICT r4
    #1): ``attn_impl="auto"`` (the default) routes key lengths >=
    AUTO_PALLAS_MIN_KEYS=1024 to the flash kernel — which is exactly the
    800x1344 eval/bench bucket (25x42 = 1050 keys). Everything below
    pins forward numerics, ragged masks, the custom VJP, and dropout
    determinism at lk in {1024, 1050} (interpret mode on CPU)."""

    @pytest.mark.parametrize("lq,lk", [
        (1050, 1050),   # encoder self-attention, 800x1344 bucket
        (100, 1050),    # decoder cross-attention, 800x1344 bucket
        (1024, 1024),   # exactly the auto-dispatch threshold
    ])
    def test_forward_parity(self, rng, lq, lk):
        b, h, dh = 1, 8, 32  # the production head geometry (256/8)
        q = jnp.asarray(
            rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
        k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        ours = flash_attention.mha(q, k, v)
        ref = flash_attention.reference_mha(q, k, v)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("lk", [1024, 1050])
    def test_forward_parity_ragged_mask(self, rng, lk):
        """Bucketed eval at 800x1344: each batch element's true image is
        smaller than the bucket, so the kernel sees ragged valid key
        prefixes (the real serving configuration)."""
        b, lq, h, dh = 2, lk, 8, 32
        q = jnp.asarray(
            rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
        k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        mask = np.zeros((b, lk), bool)
        mask[0, 805:] = True   # a 736x1120 image inside the 800x1344 bucket
        mask[1, 988:] = True   # a 779x1300 image
        ours = flash_attention.mha(q, k, v, key_padding_mask=jnp.asarray(mask))
        ref = flash_attention.reference_mha(
            q, k, v, key_padding_mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("lk", [1024, 1050])
    def test_vjp_parity(self, rng, lk):
        """Custom-VJP backward at production key lengths, ragged mask."""
        b, lq, h, dh = 1, 256, 8, 32
        q = jnp.asarray(
            rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
        k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        m = np.zeros((b, lk), bool)
        m[0, 1000:] = True
        mask = jnp.asarray(m)
        w = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32))

        def ours_loss(q, k, v):
            return jnp.sum(
                flash_attention.mha(q, k, v, key_padding_mask=mask) * w)

        def ref_loss(q, k, v):
            return jnp.sum(
                flash_attention.reference_mha(
                    q, k, v, key_padding_mask=mask) * w)

        g_ours = jax.grad(ours_loss, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ours, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)

    @pytest.mark.parametrize("lq,lk", [
        (252, 252),   # encoder self-attention, b8 376x672 train recipe
        (100, 252),   # decoder cross-attention, same
    ])
    def test_train_shape_vjp_parity(self, rng, lq, lk):
        """The r5 train-aware dispatch (AUTO_PALLAS_MIN_KEYS_TRAIN=128)
        routes the reference training recipe's 376x672 batches (12x21
        stride-32 feature map = 252 keys) through the kernel when
        differentiating; pin the custom VJP with a ragged mask at
        exactly that shape."""
        b, h, dh = 2, 8, 32
        q = jnp.asarray(
            rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
        k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        m = np.zeros((b, lk), bool)
        m[0, 180:] = True   # a smaller image inside the 376x672 bucket
        mask = jnp.asarray(m)
        w = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32))

        def ours_loss(q, k, v):
            return jnp.sum(
                flash_attention.mha(q, k, v, key_padding_mask=mask) * w)

        def ref_loss(q, k, v):
            return jnp.sum(
                flash_attention.reference_mha(
                    q, k, v, key_padding_mask=mask) * w)

        np.testing.assert_allclose(
            np.asarray(flash_attention.mha(q, k, v, key_padding_mask=mask)),
            np.asarray(flash_attention.reference_mha(
                q, k, v, key_padding_mask=mask)),
            atol=2e-5, rtol=1e-4)
        g_ours = jax.grad(ours_loss, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ours, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)

    def test_dropout_deterministic_at_1050(self, rng):
        """In-kernel dropout at the production key length: same seed ->
        identical output; rate 0 with a seed == no-dropout path."""
        from detr_tensorflow_tpu.ops.pallas.flash_attention import mha

        b, lq, lk, h, dh = 1, 128, 1050, 2, 32
        q = jnp.asarray(
            rng.normal(size=(b, lq, h, dh)).astype(np.float32)) * dh**-0.5
        k = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, lk, h, dh)).astype(np.float32))
        base = mha(q, k, v)
        zero_rate = mha(q, k, v, dropout_rate=0.0,
                        dropout_seed=jnp.asarray([7], jnp.int32))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(zero_rate))
        seed = jnp.asarray([123], jnp.int32)
        a = mha(q, k, v, dropout_rate=0.1, dropout_seed=seed)
        b_ = mha(q, k, v, dropout_rate=0.1, dropout_seed=seed)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


class TestAutoDispatch:
    """attn_impl="auto" (VERDICT r3 item 5): shape-dispatched flash
    kernel — pallas exactly when the key length crosses the threshold
    on a TPU backend, XLA everywhere else, so parity and CPU tests are
    untouched by flipping a model to auto."""

    def test_resolution_logic(self, monkeypatch):
        from detr_tensorflow_tpu.models import transformer as T

        # Explicit impls pass through regardless of shape.
        assert T.resolve_attn_impl("xla", 4096) == "xla"
        assert T.resolve_attn_impl("pallas", 8) == "pallas"
        # Short keys / weight requests resolve to xla before any
        # backend check.
        assert T.resolve_attn_impl("auto", 100) == "xla"
        assert T.resolve_attn_impl(
            "auto", 2048, return_weights=True) == "xla"
        # Long keys: backend decides.
        import jax

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert T.resolve_attn_impl("auto", T.AUTO_PALLAS_MIN_KEYS) == \
            "pallas"
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert T.resolve_attn_impl("auto", 4096) == "xla"

    def test_train_threshold(self, monkeypatch):
        """train=True lowers the crossover to AUTO_PALLAS_MIN_KEYS_TRAIN
        (the backward's score-matrix HBM traffic, measured in
        scripts/attn_train_probe.py): the 231-key train bucket routes to
        the kernel when differentiating, stays on XLA forward-only, and
        decoder self-attention (100 queries) stays on XLA in both."""
        import jax

        from detr_tensorflow_tpu.models import transformer as T

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert T.resolve_attn_impl("auto", 231, train=False) == "xla"
        assert T.resolve_attn_impl("auto", 231, train=True) == "pallas"
        assert T.resolve_attn_impl(
            "auto", T.AUTO_PALLAS_MIN_KEYS_TRAIN, train=True) == "pallas"
        assert T.resolve_attn_impl("auto", 100, train=True) == "xla"
        # Weight requests still force XLA (kernel never materializes
        # the weights), and CPU backends never see the kernel.
        assert T.resolve_attn_impl(
            "auto", 231, return_weights=True, train=True) == "xla"
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert T.resolve_attn_impl("auto", 231, train=True) == "xla"

    def test_auto_routes_model_to_kernel_at_production_keys(
        self, rng, monkeypatch
    ):
        """On a TPU backend the DEFAULT dispatch sends the 800x1344
        eval/bench bucket (1050 keys) through the flash kernel: tracing
        the transformer under attn_impl='auto' emits pallas_call ops at
        1050 keys and none at the 252-key train size (VERDICT r4 #1 —
        the production path is the kernel, so the kernel must be what
        the tests exercise)."""
        import jax

        from detr_tensorflow_tpu.models.transformer import Transformer

        kw = dict(model_dim=32, num_heads=4, num_encoder_layers=1,
                  num_decoder_layers=1, dim_feedforward=32, dropout=0.0)
        m_auto = Transformer(attn_impl="auto", **kw)
        qe = jnp.zeros((6, 32), jnp.float32)

        def trace(lk):
            x = jnp.zeros((1, lk, 32), jnp.float32)
            v = Transformer(attn_impl="xla", **kw).init(
                jax.random.PRNGKey(0), x, x, qe)
            return str(jax.make_jaxpr(
                lambda vv, xx: m_auto.apply(vv, xx, xx, qe))(v, x))

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert "pallas_call" in trace(1050)
        assert "pallas_call" not in trace(252)

    def test_auto_model_equals_xla_off_tpu(self, rng):
        """On the CPU suite, an auto model IS the xla model bit for bit
        (the dispatch resolves at trace time, no runtime branch)."""
        import jax
        import jax.numpy as jnp

        from detr_tensorflow_tpu.models.transformer import Transformer

        kw = dict(model_dim=32, num_heads=4, num_encoder_layers=2,
                  num_decoder_layers=2, dim_feedforward=64, dropout=0.0)
        x = jnp.asarray(rng.normal(size=(2, 600, 32)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(2, 600, 32)).astype(np.float32))
        qe = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
        m_auto = Transformer(attn_impl="auto", **kw)
        m_xla = Transformer(attn_impl="xla", **kw)
        v = m_xla.init(jax.random.PRNGKey(0), x, pos, qe)
        hs_a, _ = m_auto.apply(v, x, pos, qe)
        hs_x, _ = m_xla.apply(v, x, pos, qe)
        np.testing.assert_array_equal(np.asarray(hs_a), np.asarray(hs_x))
