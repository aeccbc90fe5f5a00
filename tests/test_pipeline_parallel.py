"""Pipeline parallelism (parallel/pp.py): GPipe schedule correctness,
differentiability, DP x PP mesh composition, and a real DETR encoder
stack pipelined over stages — all on the simulated 8-device CPU mesh
(tests/conftest.py), the same path the driver's multichip dryrun
validates. (SURVEY.md §2.6: the reference has no parallelism at all.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detr_tensorflow_tpu.parallel import make_mesh
from detr_tensorflow_tpu.parallel.pp import (
    pipeline_forward,
    pipeline_transformer_encoder,
    scan_layers,
    split_layers_into_stages,
    stack_stage_params,
)


def _toy_stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _toy_params(rng, n, d):
    return [
        {
            "w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3),
            "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        }
        for _ in range(n)
    ]


class TestPipelineForward:
    @pytest.mark.parametrize("n_micro", [2, 4, 8])
    def test_matches_sequential(self, rng, n_micro):
        mesh = make_mesh(4, axis_names=("stage",))
        params = _toy_params(rng, 4, 16)
        x = jnp.asarray(rng.normal(size=(8, 5, 16)).astype(np.float32))

        ref = x
        for p in params:
            ref = _toy_stage(p, ref)

        out = pipeline_forward(
            _toy_stage, stack_stage_params(params), x, mesh,
            n_micro=n_micro,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_jit_and_grads_match(self, rng):
        """The pipelined program differentiates end-to-end (scan +
        ppermute + psum transpose rules) and grads equal the sequential
        model's."""
        mesh = make_mesh(4, axis_names=("stage",))
        params = _toy_params(rng, 4, 8)
        stacked = stack_stage_params(params)
        x = jnp.asarray(rng.normal(size=(4, 3, 8)).astype(np.float32))

        def seq_loss(ps, x):
            h = x
            for i in range(4):
                h = _toy_stage(jax.tree.map(lambda a: a[i], ps), h)
            return (h ** 2).sum()

        def pp_loss(ps, x):
            return (
                pipeline_forward(_toy_stage, ps, x, mesh, n_micro=4) ** 2
            ).sum()

        g_seq = jax.grad(seq_loss)(stacked, x)
        g_pp = jax.jit(jax.grad(pp_loss))(stacked, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_seq, g_pp,
        )

    def test_remat_stage_grads_identical(self, rng):
        """remat_stage=True recomputes stage activations in backward;
        gradients must be identical to the non-remat pipeline."""
        mesh = make_mesh(4, axis_names=("stage",))
        params = _toy_params(rng, 4, 8)
        stacked = stack_stage_params(params)
        x = jnp.asarray(rng.normal(size=(4, 3, 8)).astype(np.float32))

        def loss(remat):
            def f(ps, x):
                return (
                    pipeline_forward(
                        _toy_stage, ps, x, mesh, n_micro=4,
                        remat_stage=remat,
                    ) ** 2
                ).sum()
            return f

        g_plain = jax.jit(jax.grad(loss(False)))(stacked, x)
        g_remat = jax.jit(jax.grad(loss(True)))(stacked, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            g_plain, g_remat,
        )

    def test_dp_pp_composition(self, rng):
        """2-way data x 4-way stage on one mesh: batch shards over
        'data', stages rotate over 'stage', output matches sequential."""
        mesh = make_mesh(8, axis_names=("data", "stage"), axis_sizes=(2, 4))
        params = _toy_params(rng, 4, 16)
        x = jnp.asarray(rng.normal(size=(8, 5, 16)).astype(np.float32))

        ref = x
        for p in params:
            ref = _toy_stage(p, ref)

        out = jax.jit(
            lambda ps, x: pipeline_forward(
                _toy_stage, ps, x, mesh, n_micro=4, data_axis="data"
            )
        )(stack_stage_params(params), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_split_layers_into_stages_shapes(self, rng):
        params = _toy_params(rng, 8, 4)
        staged = split_layers_into_stages(params, 4)
        assert staged["w"].shape == (4, 2, 4, 4)
        # Stage 1, sublayer 0 must be original layer 2.
        np.testing.assert_array_equal(
            np.asarray(staged["w"][1, 0]), np.asarray(params[2]["w"])
        )


class TestTpInsideStage:
    """PP x TP (x DP): the shard_map goes partial-manual (stage/data
    manual, model auto) so GSPMD shards each stage's matmuls from the
    parameters' own TP shardings — three parallelism axes in one
    program."""

    @staticmethod
    def _mlp_stage(p, x):
        # Column-then-row split: w1 sharded on its output dim, w2 on its
        # input dim (the Megatron pattern parallel/tp.py annotates).
        return x + jnp.tanh(x @ p["w1"]) @ p["w2"]

    def _mlp_params(self, rng, n, d, f):
        return [
            {
                "w1": jnp.asarray(
                    rng.normal(size=(d, f)).astype(np.float32) * 0.3),
                "w2": jnp.asarray(
                    rng.normal(size=(f, d)).astype(np.float32) * 0.3),
            }
            for _ in range(n)
        ]

    def test_pp_tp_forward_and_grads(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(8, axis_names=("stage", "model"),
                         axis_sizes=(4, 2))
        params = self._mlp_params(rng, 4, 16, 32)
        x = jnp.asarray(rng.normal(size=(8, 5, 16)).astype(np.float32))

        ref = x
        for p in params:
            ref = self._mlp_stage(p, ref)

        stacked = stack_stage_params(params)
        stacked = {
            "w1": jax.device_put(
                stacked["w1"],
                NamedSharding(mesh, P("stage", None, "model"))),
            "w2": jax.device_put(
                stacked["w2"],
                NamedSharding(mesh, P("stage", "model", None))),
        }

        def pp(ps, x):
            return pipeline_forward(
                self._mlp_stage, ps, x, mesh, n_micro=4,
                tp_axis="model",
            )

        out = jax.jit(pp)(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def seq_loss(ps, x):
            h = x
            for i in range(4):
                h = self._mlp_stage(jax.tree.map(lambda a: a[i], ps), h)
            return (h ** 2).sum()

        g_seq = jax.grad(seq_loss)(stack_stage_params(params), x)
        g_pp = jax.jit(jax.grad(lambda ps, x: (pp(ps, x) ** 2).sum()))(
            stacked, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_seq, dict(g_pp),
        )
        # The TP layout survives the round trip: grads come back sharded
        # over the model axis, ready for the optimizer.
        assert "model" in str(g_pp["w1"].sharding.spec)

    def test_detr_dp_pp_tp(self, rng):
        """The real DETR on a (data=2, stage=2, model=2) mesh: encoder
        GPipe-staged, its attention/FFN matmuls TP-sharded by
        parallel/tp.py annotations, batch data-sharded — forward and
        grads equal the unsharded sequential model."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec
        from detr_tensorflow_tpu.parallel.tp import shard_params

        mesh = make_mesh(8, axis_names=("data", "stage", "model"),
                         axis_sizes=(2, 2, 2))
        kw = dict(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        seq_model = DETR(**kw)
        pp_model = DETR(**kw, pipeline=PipelineSpec(
            mesh=mesh, data_axis="data", tp_axis="model"))

        x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
        variables = seq_model.init(jax.random.PRNGKey(0), x[:1])
        out_seq = seq_model.apply(variables, x)

        tp_params = shard_params(variables["params"], mesh)
        frozen = variables.get("frozen", {})
        out_pp = jax.jit(
            lambda p, a: pp_model.apply({"params": p, "frozen": frozen}, a)
        )(tp_params, x)
        np.testing.assert_allclose(
            np.asarray(out_pp["pred_logits"]),
            np.asarray(out_seq["pred_logits"]), rtol=2e-5, atol=2e-5)

        boxes = jnp.asarray(
            np.clip(rng.uniform(0.2, 0.8, (4, 6, 4)), 0.05, 0.95)
            .astype(np.float32))
        classes = jnp.ones((4, 6), jnp.int32)
        tmask = jnp.asarray(
            np.tile([True, True, False, False, False, False], (4, 1)))

        def loss(model):
            def f(p):
                out = model.apply({"params": p, "frozen": frozen}, x)
                total, _ = detr_loss(out, boxes, classes, tmask, 7)
                return total
            return f

        g_seq = jax.grad(loss(seq_model))(variables["params"])
        g_pp = jax.jit(jax.grad(loss(pp_model)))(tp_params)
        flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
        flat_pp = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
        for k, v in flat_seq:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_pp[ks]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=ks)


class Test1F1B:
    """pipeline_train_1f1b: the explicit-VJP 1F1B training step. Loss,
    per-stage parameter grads, and the input cotangent must all equal
    the sequential model's; the ring buffer must survive T >> 2S
    wraparound; DP x PP must compose."""

    def _seq(self, stacked, x, tgt):
        h = x
        for i in range(stacked["w"].shape[0]):
            h = _toy_stage(jax.tree.map(lambda a: a[i], stacked), h)
        return ((h - tgt) ** 2).sum()

    @staticmethod
    def _loss(y, tgt):
        return ((y - tgt) ** 2).sum()

    @pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 8), (2, 16)])
    def test_matches_sequential(self, rng, n_stages, n_micro):
        from detr_tensorflow_tpu.parallel.pp import pipeline_train_1f1b

        mesh = make_mesh(n_stages, axis_names=("stage",))
        params = _toy_params(rng, n_stages, 8)
        stacked = stack_stage_params(params)
        b = 16
        x = jnp.asarray(rng.normal(size=(b, 3, 8)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(b, 3, 8)).astype(np.float32))

        loss_seq, (g_seq, dx_seq) = jax.value_and_grad(
            self._seq, argnums=(0, 1))(stacked, x, tgt)

        loss, grads, dx = jax.jit(
            lambda ps, x, tgt: pipeline_train_1f1b(
                _toy_stage, self._loss, ps, x, tgt, mesh,
                n_micro=n_micro,
            )
        )(stacked, x, tgt)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
            grads, g_seq,
        )
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_seq),
                                   rtol=1e-4, atol=1e-5)

    def test_dp_pp_composition(self, rng):
        from detr_tensorflow_tpu.parallel.pp import pipeline_train_1f1b

        mesh = make_mesh(8, axis_names=("data", "stage"),
                         axis_sizes=(2, 4))
        params = _toy_params(rng, 4, 8)
        stacked = stack_stage_params(params)
        b = 8
        x = jnp.asarray(rng.normal(size=(b, 3, 8)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(b, 3, 8)).astype(np.float32))

        loss_seq, (g_seq, dx_seq) = jax.value_and_grad(
            self._seq, argnums=(0, 1))(stacked, x, tgt)

        loss, grads, dx = jax.jit(
            lambda ps, x, tgt: pipeline_train_1f1b(
                _toy_stage, self._loss, ps, x, tgt, mesh,
                n_micro=4, data_axis="data",
            )
        )(stacked, x, tgt)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
            grads, g_seq,
        )
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_seq),
                                   rtol=1e-4, atol=1e-5)

    def test_loss_stage_params(self, rng):
        """loss_params: the post-pipeline model part (a head here,
        decoder+heads+loss in a staged DETR) trains per-microbatch at
        the last stage — its grads must equal the sequential model's."""
        from detr_tensorflow_tpu.parallel.pp import pipeline_train_1f1b

        mesh = make_mesh(4, axis_names=("stage",))
        params = _toy_params(rng, 4, 8)
        stacked = stack_stage_params(params)
        head = {"w": jnp.asarray(
            rng.normal(size=(8, 5)).astype(np.float32) * 0.3)}
        b = 8
        x = jnp.asarray(rng.normal(size=(b, 3, 8)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(b, 3, 5)).astype(np.float32))

        def head_loss(lp, y, t):
            return ((y @ lp["w"] - t) ** 2).sum()

        def seq(stacked, head, x):
            h = x
            for i in range(4):
                h = _toy_stage(jax.tree.map(lambda a: a[i], stacked), h)
            return head_loss(head, h, tgt)

        loss_seq, (g_seq, gh_seq, dx_seq) = jax.value_and_grad(
            seq, argnums=(0, 1, 2))(stacked, head, x)

        loss, grads, dx, gh = jax.jit(
            lambda ps, lp, x, tgt: pipeline_train_1f1b(
                _toy_stage, head_loss, ps, x, tgt, mesh,
                n_micro=4, loss_params=lp,
            )
        )(stacked, head, x, tgt)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
            grads, g_seq,
        )
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
            gh, gh_seq,
        )
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_seq),
                                   rtol=1e-4, atol=1e-5)

    def test_memory_bounded_by_depth(self, rng):
        """The 1F1B memory claim, checked against XLA's own accounting
        (compiled.memory_analysis): as n_micro grows at fixed microbatch
        size, GPipe+AD temp memory grows with the stored activations of
        every in-flight microbatch, while 1F1B's growth is ONLY the
        unavoidable input/target/dx data bytes — its live schedule
        state (the 2S-slot ring buffer) does not scale with T."""
        from detr_tensorflow_tpu.parallel.pp import (
            pipeline_forward, pipeline_train_1f1b)

        mesh = make_mesh(4, axis_names=("stage",))
        D, L = 64, 16  # 4 layers per stage
        layers = _toy_params(rng, L, D)
        staged = split_layers_into_stages(layers, 4)
        stage = scan_layers(_toy_stage)

        def sq_loss(y, t):
            return ((y - t) ** 2).sum()

        def temp_bytes(T):
            b = T * 2  # fixed microbatch size 2
            x = jnp.zeros((b, 8, D), jnp.float32)
            tgt = jnp.zeros((b, 8, D), jnp.float32)

            def gpipe_grad(ps, x, tgt):
                return jax.grad(lambda ps: sq_loss(
                    pipeline_forward(stage, ps, x, mesh, n_micro=T), tgt
                ))(ps)

            def f1b(ps, x, tgt):
                return pipeline_train_1f1b(
                    stage, sq_loss, ps, x, tgt, mesh, n_micro=T)

            mg = jax.jit(gpipe_grad).lower(staged, x, tgt).compile() \
                .memory_analysis().temp_size_in_bytes
            mf = jax.jit(f1b).lower(staged, x, tgt).compile() \
                .memory_analysis().temp_size_in_bytes
            return mg, mf

        g16, f16 = temp_bytes(16)
        g64, f64 = temp_bytes(64)
        gpipe_slope = (g64 - g16) / 48  # bytes per extra microbatch
        f1b_slope = (f64 - f16) / 48
        # The data floor: one microbatch of x + tgt + dx, f32 (2,8,64).
        data_floor = 3 * 2 * 8 * D * 4
        assert f1b_slope <= data_floor * 1.25, (f1b_slope, data_floor)
        # GPipe additionally stores per-layer activations for every
        # in-flight microbatch: materially steeper.
        assert gpipe_slope >= 3 * f1b_slope, (gpipe_slope, f1b_slope)

    def test_encoder_stack_1f1b(self, rng):
        """The real EncoderLayer stack trained 1F1B: grads equal the
        sequential stack's (scan_layers inside each stage, vjp
        recompute at backward time)."""
        from detr_tensorflow_tpu.models.transformer import EncoderLayer
        from detr_tensorflow_tpu.parallel.pp import pipeline_train_1f1b

        d, heads = 16, 2
        layer = EncoderLayer(
            model_dim=d, num_heads=heads, dim_feedforward=32, dropout=0.0
        )
        b, s = 8, 6
        src = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(1, s, d)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        layer_params = [layer.init(k, src, pos)["params"] for k in keys]

        apply_one = lambda p, a: layer.apply({"params": p}, a, pos)

        def seq_loss(ps, x):
            h = x
            for p in ps:
                h = apply_one(p, h)
            return ((h - tgt) ** 2).sum()

        loss_seq, g_seq = jax.value_and_grad(seq_loss)(layer_params, src)

        mesh = make_mesh(4, axis_names=("stage",))
        staged = split_layers_into_stages(layer_params, 4)
        loss, grads, _ = jax.jit(
            lambda ps, x, tgt: pipeline_train_1f1b(
                scan_layers(apply_one),
                lambda y, t: ((y - t) ** 2).sum(),
                ps, x, tgt, mesh, n_micro=4,
            )
        )(staged, src, tgt)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-4)
        # grads leaves: (n_stages, layers_per_stage, ...) — re-split to
        # per-layer and compare.
        for i in range(4):
            g_i = jax.tree.map(lambda a: a[i, 0], grads)
            jax.tree.map(
                lambda a, b_: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-4),
                g_i, g_seq[i],
            )


class TestFullDetr1F1B:
    def test_full_model_train_step(self, rng):
        """The COMPLETE DETR trained through the 1F1B schedule: backbone
        backward chained via dx, encoder layers staged, and
        decoder + heads + Hungarian set loss riding as loss_params at
        the last stage. Loss and every gradient (backbone, input_proj,
        encoder layers, decoder, heads, query_embed, and the position
        cotangent) must equal jax.grad of the sequential model."""
        import jax.numpy as jnp

        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.models.layers import MLP
        from detr_tensorflow_tpu.models.position import (
            sine_position_embedding)
        from detr_tensorflow_tpu.models.resnet import ResNetBackbone
        from detr_tensorflow_tpu.models.transformer import (
            DecoderLayer, EncoderLayer)
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.pp import (
            pipeline_train_1f1b, scan_layers, split_layers_into_stages)
        from flax import linen as nn

        D, HEADS, Q, C = 16, 2, 6, 8
        S, T = 4, 4
        model = DETR(
            num_classes=C, num_queries=Q, model_dim=D, num_heads=HEADS,
            num_encoder_layers=S, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        b = 8
        images = jnp.asarray(
            rng.normal(size=(b, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), images[:1])
        params, frozen = variables["params"], variables["frozen"]

        targets = {
            "boxes": jnp.asarray(
                np.clip(rng.uniform(0.2, 0.8, (b, Q, 4)), 0.05, 0.95)
                .astype(np.float32)),
            "classes": jnp.ones((b, Q), jnp.int32),
            "tmask": jnp.asarray(
                np.tile([True, True, False, False, False, False], (b, 1))),
        }

        backbone = ResNetBackbone(stage_sizes=(1, 1, 1, 1))
        proj = nn.Conv(D, (1, 1), name="input_proj")
        enc_template = EncoderLayer(D, HEADS, 32, 0.0)
        dec_template = DecoderLayer(D, HEADS, 32, 0.0)
        norm = nn.LayerNorm(epsilon=1e-5)
        class_embed = nn.Dense(C)
        bbox_embed = MLP(D, 4)

        def pre_fn(pre_params, images):
            """backbone + input_proj + sine positions -> (src, pos)."""
            feats = backbone.apply(
                {"params": pre_params["backbone"],
                 "frozen": frozen["backbone"]}, images)
            bb, fh, fw, _ = feats.shape
            valid = jnp.ones((bb, fh, fw), jnp.float32)
            pos = sine_position_embedding(valid, num_pos_features=D // 2)
            src = proj.apply(
                {"params": pre_params["input_proj"]}, feats
            ).reshape(bb, fh * fw, D)
            return {"src": src, "pos": pos.reshape(bb, fh * fw, D)}

        def stage_fn_one(p, t):
            return {**t, "src": enc_template.apply(
                {"params": p}, t["src"], t["pos"])}

        # Batch-GLOBAL normalizers, known upfront from the targets: each
        # microbatch's loss becomes sum(term)/global_denominator, so the
        # schedule's sum over microbatches equals the standard
        # whole-batch detr_loss exactly (ops/losses.py).
        from detr_tensorflow_tpu.ops.losses import global_loss_normalizers
        gnorm = global_loss_normalizers(targets["tmask"], Q)

        def post_loss(lp, y, tgt):
            """decoder + heads + set loss, per microbatch."""
            memory, pos = y["src"], y["pos"]
            bb = memory.shape[0]
            query_pos = jnp.broadcast_to(
                lp["query_embed"][None], (bb, Q, D))
            h = dec_template.apply(
                {"params": lp["decoder_layer_0"]},
                jnp.zeros_like(query_pos), memory, pos, query_pos,
                None, False)
            hs = norm.apply({"params": lp["decoder_norm"]}, h)[None]
            logits = class_embed.apply({"params": lp["class_embed"]}, hs)
            boxes = bbox_embed.apply({"params": lp["bbox_embed"]}, hs)
            out = {
                "pred_logits": logits[-1], "pred_boxes": boxes[-1],
                "aux_logits": logits[:-1], "aux_boxes": boxes[:-1],
            }
            total, _ = detr_loss(
                out, tgt["boxes"], tgt["classes"], tgt["tmask"], C - 1,
                norm=gnorm)
            return total

        tr = params["transformer"]
        enc_params = [tr[f"encoder_layer_{i}"] for i in range(S)]
        pre_params = {"backbone": params["backbone"],
                      "input_proj": params["input_proj"]}
        lp = {
            "decoder_layer_0": tr["decoder_layer_0"],
            "decoder_norm": tr["decoder_norm"],
            "class_embed": params["class_embed"],
            "bbox_embed": params["bbox_embed"],
            "query_embed": params["query_embed"],
        }

        # ---- sequential reference: the STANDARD whole-batch loss ----
        # (thanks to the global normalizers, the microbatched schedule
        # must reproduce this exactly, not just a per-microbatch sum).
        def seq_loss(pre_p, enc_ps, lp, images):
            y = pre_fn(pre_p, images)
            for p in enc_ps:
                y = stage_fn_one(p, y)
            return post_loss(lp, y, targets)

        loss_seq, (g_pre_seq, g_enc_seq, g_lp_seq) = jax.value_and_grad(
            seq_loss, argnums=(0, 1, 2))(pre_params, enc_params, lp,
                                         images)

        # ---- 1F1B: pre-forward via vjp, pipeline, chain dx back ----
        mesh = make_mesh(S, axis_names=("stage",))

        def full_1f1b(pre_p, enc_stacked, lp, images):
            y, pre_vjp = jax.vjp(lambda pp_: pre_fn(pp_, images), pre_p)
            loss, enc_g, dx, lp_g = pipeline_train_1f1b(
                stage_fn_one, post_loss, enc_stacked, y, targets, mesh,
                n_micro=T, loss_params=lp)
            (pre_g,) = pre_vjp(dx)
            return loss, pre_g, enc_g, lp_g

        loss, pre_g, enc_g, lp_g = jax.jit(full_1f1b)(
            pre_params, stack_stage_params(enc_params), lp, images)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)

        def tree_close(a, b_, msg):
            flat_a = {jax.tree_util.keystr(k): v for k, v in
                      jax.tree_util.tree_leaves_with_path(a)}
            for k, v in jax.tree_util.tree_leaves_with_path(b_):
                ks = jax.tree_util.keystr(k)
                np.testing.assert_allclose(
                    np.asarray(flat_a[ks]), np.asarray(v),
                    rtol=5e-4, atol=5e-5, err_msg=f"{msg}{ks}")

        tree_close(pre_g, g_pre_seq, "pre")
        tree_close(lp_g, g_lp_seq, "lp")
        for i in range(S):
            tree_close(jax.tree.map(lambda a: a[i], enc_g),
                       g_enc_seq[i], f"enc{i}")


class TestDetr1F1BValueAndGrad:
    def test_equals_sequential_value_and_grad(self, rng):
        """The library integration (parallel/detr_1f1b.py): loss and the
        full params-shaped gradient tree equal jax.value_and_grad of the
        PLAIN sequential model with the standard whole-batch detr_loss —
        no reformulation, same variables tree, optax-ready grads."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.detr_1f1b import (
            detr_1f1b_value_and_grad)

        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=2,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        b = 8
        images = jnp.asarray(
            rng.normal(size=(b, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), images[:1])
        batch = {
            "images": images,
            "boxes": jnp.asarray(
                np.clip(rng.uniform(0.2, 0.8, (b, 6, 4)), 0.05, 0.95)
                .astype(np.float32)),
            "classes": jnp.ones((b, 6), jnp.int32),
            "mask": jnp.asarray(
                np.tile([True, True, False, False, False, False],
                        (b, 1))),
        }

        def seq_loss(p):
            out = model.apply(
                {"params": p, "frozen": variables["frozen"]},
                batch["images"])
            total, _ = detr_loss(
                out, batch["boxes"], batch["classes"], batch["mask"], 7)
            return total

        loss_seq, g_seq = jax.value_and_grad(seq_loss)(
            variables["params"])

        mesh = make_mesh(8, axis_names=("data", "stage"),
                         axis_sizes=(2, 4))
        loss, grads = jax.jit(
            lambda v, bt: detr_1f1b_value_and_grad(
                model, v, bt, mesh, background_class=7,
                data_axis="data")
        )(variables, batch)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)
        flat_pp = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_leaves_with_path(grads)}
        for k, v in jax.tree_util.tree_leaves_with_path(g_seq):
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_pp[ks]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=ks)

        # And the grads drive a standard optax update.
        import optax

        opt = optax.adam(1e-3)
        state = opt.init(variables["params"])
        updates, _ = opt.update(grads, state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        assert jax.tree.reduce(
            lambda a, l: a + int(np.isfinite(np.asarray(l)).all()),
            new_params, 0
        ) == len(jax.tree.leaves(new_params))


    def test_8stage_enc_dec_staged_equals_sequential(self, rng):
        """VERDICT r4 #5 'done' criterion: 8-stage 1F1B with BOTH the
        encoder and decoder stacks on the stage axis (6+6 layers -> 12
        slots over 8 stages, per=2 with 4 identity pad slots at the
        tail), loss and full gradient tree equal to the sequential
        model."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.detr_1f1b import (
            detr_1f1b_value_and_grad)

        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=6, num_decoder_layers=6,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        b = 8
        images = jnp.asarray(
            rng.normal(size=(b, 32, 32, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), images[:1])
        batch = {
            "images": images,
            "boxes": jnp.asarray(
                np.clip(rng.uniform(0.2, 0.8, (b, 6, 4)), 0.05, 0.95)
                .astype(np.float32)),
            "classes": jnp.ones((b, 6), jnp.int32),
            "mask": jnp.asarray(
                np.tile([True, True, False, False, False, False],
                        (b, 1))),
        }

        def seq_loss(p):
            out = model.apply(
                {"params": p, "frozen": variables["frozen"]},
                batch["images"])
            total, _ = detr_loss(
                out, batch["boxes"], batch["classes"], batch["mask"], 7)
            return total

        loss_seq, g_seq = jax.value_and_grad(seq_loss)(
            variables["params"])

        mesh = make_mesh(8, axis_names=("stage",))
        loss, grads = jax.jit(
            lambda v, bt: detr_1f1b_value_and_grad(
                model, v, bt, mesh, background_class=7)
        )(variables, batch)

        np.testing.assert_allclose(float(loss), float(loss_seq),
                                   rtol=1e-5)
        flat_pp = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_leaves_with_path(grads)}
        for k, v in jax.tree_util.tree_leaves_with_path(g_seq):
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_pp[ks]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=ks)
        # every decoder layer (not just the last-stage ones) got a
        # nonzero gradient — the staging really spread them out
        for i in range(6):
            g = grads["transformer"][f"decoder_layer_{i}"]
            assert max(float(np.abs(np.asarray(l)).max())
                       for l in jax.tree.leaves(g)) > 0, i

    def test_dropout_trains_through_schedule(self, rng):
        """model.dropout > 0: per-layer encoder keys ride with the
        stages (exactly replayed in the backward re-linearization) and
        the decoder draws per-microbatch keys — deterministic given
        the key, different across keys, finite grads, and the Trainer
        integration converges with the reference recipe's dropout."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.parallel.detr_1f1b import (
            detr_1f1b_value_and_grad)
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec
        from detr_tensorflow_tpu.train import Trainer, TrainingConfig

        mesh = make_mesh(4, axis_names=("stage",))
        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.1,
        )
        b = 4
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        batch = {
            "images": jnp.asarray(rng.normal(size=(b, 32, 32, 3)),
                                  jnp.float32),
            "boxes": jnp.asarray(
                np.clip(rng.uniform(0.2, 0.8, (b, 6, 4)), 0.05, 0.95)
                .astype(np.float32)),
            "classes": jnp.ones((b, 6), jnp.int32),
            "mask": jnp.asarray(
                np.tile([True, True, False, False, False, False],
                        (b, 1))),
        }

        f = jax.jit(lambda v, bt, key: detr_1f1b_value_and_grad(
            model, v, bt, mesh, background_class=7, dropout_rng=key)[0])
        l_a = float(f(variables, batch, jax.random.PRNGKey(5)))
        l_a2 = float(f(variables, batch, jax.random.PRNGKey(5)))
        l_b = float(f(variables, batch, jax.random.PRNGKey(6)))
        assert l_a == l_a2, "dropout must be deterministic given the key"
        assert l_a != l_b, "different keys must draw different masks"

        _, grads = jax.jit(lambda v, bt: detr_1f1b_value_and_grad(
            model, v, bt, mesh, background_class=7,
            dropout_rng=jax.random.PRNGKey(5)))(variables, batch)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))

        # missing key with dropout on is a clear error
        with pytest.raises(ValueError, match="dropout_rng"):
            detr_1f1b_value_and_grad(
                model, variables, batch, mesh, background_class=7)

        config = TrainingConfig(
            background_class=7, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=b, target_batch=b, transformers_lr=1e-3,
        )
        trainer = Trainer(
            model, variables, config,
            pipeline_1f1b=PipelineSpec(mesh=mesh),
        )
        first = float(trainer.step(batch)["total_loss"])
        for _ in range(6):
            log = trainer.step(batch)
        assert float(log["total_loss"]) < first

    def test_trainer_1f1b_schedule(self, rng):
        """Trainer(pipeline_1f1b=PipelineSpec(...)): the ordinary
        Trainer trains through the interleaved schedule — first-step
        loss identical to the plain-AD Trainer (dropout 0), and the
        loss decreases."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec
        from detr_tensorflow_tpu.train import Trainer, TrainingConfig

        mesh = make_mesh(8, axis_names=("data", "stage"),
                         axis_sizes=(2, 4))
        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        config = TrainingConfig(
            background_class=7, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=8, target_batch=8, transformers_lr=1e-3,
        )
        batch = {
            "images": np.asarray(rng.normal(size=(8, 32, 32, 3)),
                                 np.float32),
            "boxes": np.clip(rng.uniform(0.2, 0.8, (8, 6, 4)), 0.05,
                             0.95).astype(np.float32),
            "classes": np.ones((8, 6), np.int32),
            "mask": np.tile([True, True, False, False, False, False],
                            (8, 1)),
        }

        plain = Trainer(model, variables, config, mesh=make_mesh(8))
        ref_first = float(plain.step(batch)["total_loss"])

        trainer = Trainer(
            model, variables, config,
            pipeline_1f1b=PipelineSpec(mesh=mesh, data_axis="data"),
        )
        first = float(trainer.step(batch)["total_loss"])
        np.testing.assert_allclose(first, ref_first, rtol=1e-5)
        for _ in range(6):
            log = trainer.step(batch)
        assert float(log["total_loss"]) < first


class TestDetrEncoderPipeline:
    def test_encoder_stack_pipelined(self, rng):
        """The real EncoderLayer (models/transformer.py) pipelined over
        4 stages x 2 layers reproduces the sequential 8-layer stack."""
        from detr_tensorflow_tpu.models.transformer import EncoderLayer

        d, heads = 32, 4
        layer = EncoderLayer(
            model_dim=d, num_heads=heads, dim_feedforward=64, dropout=0.0
        )
        b, s = 4, 12
        src = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        # (1, s, d): positions broadcast over whatever microbatch size
        # the schedule picks (they are per-location, shared across the
        # batch in this test).
        pos = jnp.asarray(rng.normal(size=(1, s, d)).astype(np.float32))

        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        layer_params = [
            layer.init(k, src, pos)["params"] for k in keys
        ]

        ref = src
        for p in layer_params:
            ref = layer.apply({"params": p}, ref, pos)

        mesh = make_mesh(4, axis_names=("stage",))
        out = jax.jit(
            lambda ps, src, pos: pipeline_transformer_encoder(
                lambda p, a: layer.apply({"params": p}, a, pos),
                # already-split params come through pipeline_transformer_
                # encoder's own splitter; pass the raw per-layer list
                ps, src, mesh, n_micro=4,
            ),
            static_argnums=(),
        )(layer_params, src, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestScheduleEdges:
    def test_n_micro_equals_stages(self, rng):
        """Minimum-occupancy schedule (bubble 50%) still exact."""
        mesh = make_mesh(4, axis_names=("stage",))
        params = _toy_params(rng, 4, 8)
        x = jnp.asarray(rng.normal(size=(4, 3, 8)).astype(np.float32))
        ref = x
        for p in params:
            ref = _toy_stage(p, ref)
        out = pipeline_forward(
            _toy_stage, stack_stage_params(params), x, mesh, n_micro=4
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_two_stage_many_micro(self, rng):
        mesh = make_mesh(2, axis_names=("stage",))
        params = _toy_params(rng, 2, 8)
        x = jnp.asarray(rng.normal(size=(16, 2, 8)).astype(np.float32))
        ref = x
        for p in params:
            ref = _toy_stage(p, ref)
        out = pipeline_forward(
            _toy_stage, stack_stage_params(params), x, mesh, n_micro=16
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestDetrPipelined:
    """The REAL DETR trained through the pipelined encoder (VERDICT r2
    item 5): same module, same parameter tree, encoder stack GPipe-staged
    over the mesh — forward, loss and gradients must equal the
    sequential model, and a DP x PP Trainer must actually train."""

    def _models(self, pipeline):
        from detr_tensorflow_tpu.models import DETR

        kw = dict(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        return DETR(**kw), DETR(**kw, pipeline=pipeline)

    def test_forward_and_grads_equal_sequential(self, rng):
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec

        mesh = make_mesh(4, axis_names=("stage",))
        seq_model, pp_model = self._models(PipelineSpec(mesh=mesh))
        x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
        variables = seq_model.init(jax.random.PRNGKey(0), x[:1])

        out_seq = seq_model.apply(variables, x)
        out_pp = jax.jit(lambda v, a: pp_model.apply(v, a))(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_pp["pred_logits"]),
            np.asarray(out_seq["pred_logits"]), rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_pp["pred_boxes"]),
            np.asarray(out_seq["pred_boxes"]), rtol=2e-5, atol=2e-5,
        )

        boxes = jnp.asarray(
            np.clip(rng.uniform(0.2, 0.8, (4, 6, 4)), 0.05, 0.95)
            .astype(np.float32)
        )
        classes = jnp.ones((4, 6), jnp.int32)
        tmask = jnp.asarray(np.tile([True, True, False, False, False, False],
                                    (4, 1)))

        frozen = variables.get("frozen", {})

        def loss(model):
            def f(p):
                out = model.apply({"params": p, "frozen": frozen}, x)
                total, _ = detr_loss(out, boxes, classes, tmask, 7)
                return total
            return f

        g_seq = jax.grad(loss(seq_model))(variables["params"])
        g_pp = jax.jit(jax.grad(loss(pp_model)))(variables["params"])
        flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
        flat_pp = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
        for k, v in flat_seq:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_pp[ks]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=ks,
            )

    def test_trainer_dp_pp_composition(self, rng):
        """DP x PP through the actual Trainer: data axis shards the
        batch, stage axis pipelines the encoder, and the loss decreases
        over steps."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec
        from detr_tensorflow_tpu.train import Trainer, TrainingConfig

        mesh = make_mesh(8, axis_names=("data", "stage"),
                         axis_sizes=(2, 4))
        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=1,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.1,
            pipeline=PipelineSpec(mesh=mesh, data_axis="data"),
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        config = TrainingConfig(
            background_class=7, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=4, target_batch=4, transformers_lr=1e-3,
        )
        trainer = Trainer(model, variables, config, mesh=mesh)
        batch = {
            "images": np.asarray(rng.normal(size=(4, 32, 32, 3)),
                                 np.float32),
            "boxes": np.clip(rng.uniform(0.2, 0.8, (4, 6, 4)), 0.05,
                             0.95).astype(np.float32),
            "classes": np.ones((4, 6), np.int32),
            "mask": np.tile([True, True, False, False, False, False],
                            (4, 1)),
        }
        first = float(trainer.step(batch)["total_loss"])
        for _ in range(8):
            log = trainer.step(batch)
        assert float(log["total_loss"]) < first

    @pytest.mark.parametrize("n_stages", [2, 4])
    def test_decoder_staged_forward_and_grads(self, rng, n_stages):
        """VERDICT r3 item 4: with num_decoder_layers divisible by the
        stage count, BOTH transformer stacks run staged — forward
        (including every aux layer, i.e. the full hs stack feeding the
        aux losses) and gradients must equal the sequential model."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.ops.losses import detr_loss
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec

        mesh = make_mesh(n_stages, axis_names=("stage",))
        kw = dict(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=4, num_decoder_layers=4,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0,
        )
        seq_model = DETR(**kw)
        pp_model = DETR(**kw, pipeline=PipelineSpec(mesh=mesh))
        x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
        variables = seq_model.init(jax.random.PRNGKey(0), x[:1])

        out_seq = seq_model.apply(variables, x)
        out_pp = jax.jit(lambda v, a: pp_model.apply(v, a))(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_pp["pred_logits"]),
            np.asarray(out_seq["pred_logits"]), rtol=2e-5, atol=2e-5,
        )
        # Every aux layer — the staged decoder's hs buffer rows.
        np.testing.assert_allclose(
            np.asarray(out_pp["aux_boxes"]),
            np.asarray(out_seq["aux_boxes"]), rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_pp["aux_logits"]),
            np.asarray(out_seq["aux_logits"]), rtol=2e-5, atol=2e-5,
        )

        boxes = jnp.asarray(
            np.clip(rng.uniform(0.2, 0.8, (4, 6, 4)), 0.05, 0.95)
            .astype(np.float32)
        )
        classes = jnp.ones((4, 6), jnp.int32)
        tmask = jnp.asarray(np.tile([True, True, False, False, False, False],
                                    (4, 1)))
        frozen = variables.get("frozen", {})

        def loss(model):
            def f(p):
                out = model.apply({"params": p, "frozen": frozen}, x)
                total, _ = detr_loss(out, boxes, classes, tmask, 7)
                return total
            return f

        g_seq = jax.grad(loss(seq_model))(variables["params"])
        g_pp = jax.jit(jax.grad(loss(pp_model)))(variables["params"])
        flat_pp = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
        for k, v in jax.tree_util.tree_leaves_with_path(g_seq):
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_pp[ks]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=ks,
            )

    def test_trainer_1f1b_masks_routes_to_gpipe(self, rng):
        """A masks model handed to the 1F1B Trainer mode must not raise:
        it routes to the GPipe pipeline (same mesh, same param tree)
        with a warning, and a train step runs."""
        from detr_tensorflow_tpu.models import DETR
        from detr_tensorflow_tpu.parallel.pp import PipelineSpec
        from detr_tensorflow_tpu.train import Trainer, TrainingConfig

        mesh = make_mesh(2, axis_names=("stage",))
        model = DETR(
            num_classes=8, num_queries=6, model_dim=16, num_heads=2,
            num_encoder_layers=2, num_decoder_layers=2,
            dim_feedforward=32, backbone_stage_sizes=(1, 1, 1, 1),
            dropout=0.0, masks=True,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        config = TrainingConfig(
            background_class=7, train_backbone=True,
            train_transformers=True, train_nlayers=True,
            batch_size=4, target_batch=4, transformers_lr=1e-3,
        )
        spec = PipelineSpec(mesh=mesh)
        with pytest.warns(UserWarning, match="GPipe"):
            trainer = Trainer(model, variables, config,
                              pipeline_1f1b=spec)
        assert trainer._pp1f1b is None
        assert trainer.model.pipeline is spec
        batch = {
            "images": np.asarray(rng.normal(size=(4, 32, 32, 3)),
                                 np.float32),
            "boxes": np.clip(rng.uniform(0.2, 0.8, (4, 6, 4)), 0.05,
                             0.95).astype(np.float32),
            "classes": np.ones((4, 6), np.int32),
            "mask": np.tile([True, True, False, False, False, False],
                            (4, 1)),
            "t_masks": np.zeros((4, 6, 32, 32), np.float32),
        }
        log = trainer.step(batch)
        assert np.isfinite(float(log["total_loss"]))
