"""Config parsing, weight save/load roundtrip, COCO JSON index."""

import json

import numpy as np
import pytest

from detr_tensorflow_tpu.train import TrainingConfig, training_config_parser
from detr_tensorflow_tpu.models import weights as weights_lib


def test_parser_updates_config():
    parser = training_config_parser()
    args = parser.parse_args([
        "--data_dir", "/data/x", "--img_dir", "imgs", "--ann_file", "a.json",
        "--batch_size", "4", "--target_batch", "16",
        "--train_backbone", "--backbone_lr", "2e-5",
        "--background_class", "91", "--compute_dtype", "bfloat16",
    ])
    config = TrainingConfig().update_from_args(args)
    assert config.batch_size == 4
    assert config.target_batch == 16
    assert config.gradient_aggregate == 4
    assert config.train_backbone is True
    assert config.train_transformers is False  # untouched default
    assert config.backbone_lr == pytest.approx(2e-5)
    assert config.background_class == 91
    assert config.compute_dtype == "bfloat16"
    assert config.data.full_img_dir == "/data/x/imgs"
    assert config.data.full_ann_file == "/data/x/a.json"


def test_config_is_immutable():
    config = TrainingConfig()
    with pytest.raises(Exception):
        config.batch_size = 99  # frozen dataclass
    config2 = config.replace(batch_size=99)
    assert config2.batch_size == 99 and config.batch_size == 1


def test_gradient_aggregate_semantics():
    assert TrainingConfig(batch_size=8, target_batch=32).gradient_aggregate == 4
    assert TrainingConfig(batch_size=8, target_batch=None).gradient_aggregate == 1
    assert TrainingConfig(batch_size=8, target_batch=4).gradient_aggregate == 1


def test_npz_variables_roundtrip(tmp_path, rng):
    tree = {
        "params": {
            "a": {"kernel": rng.normal(size=(3, 4)).astype(np.float32)},
            "b": rng.normal(size=(7,)).astype(np.float32),
        },
        "frozen": {"bn": {"running_mean": np.zeros((5,), np.float32)}},
    }
    path = str(tmp_path / "w.npz")
    weights_lib.save_variables_npz(tree, path)
    loaded = weights_lib.load_variables_npz(path)
    np.testing.assert_array_equal(loaded["params"]["a"]["kernel"], tree["params"]["a"]["kernel"])
    np.testing.assert_array_equal(loaded["params"]["b"], tree["params"]["b"])
    np.testing.assert_array_equal(
        loaded["frozen"]["bn"]["running_mean"], tree["frozen"]["bn"]["running_mean"]
    )


def test_load_weights_missing_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("DETR_TPU_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError, match="egress"):
        weights_lib.load_weights("nonexistent-weights")


def test_load_weights_npz_by_env(tmp_path, monkeypatch, rng):
    tree = {"params": {"x": rng.normal(size=(2, 2)).astype(np.float32)}}
    d = tmp_path / "wdir"
    d.mkdir()
    weights_lib.save_variables_npz(tree, str(d / "mymodel.npz"))
    monkeypatch.setenv("DETR_TPU_WEIGHTS", str(d))
    loaded = weights_lib.load_weights("mymodel")
    np.testing.assert_array_equal(loaded["params"]["x"], tree["params"]["x"])


def test_coco_index(tmp_path):
    data = {
        "images": [{"id": 7, "file_name": "a.jpg", "height": 10, "width": 20}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 3, "bbox": [1, 2, 3, 4], "iscrowd": 0},
            {"id": 2, "image_id": 7, "category_id": 5, "bbox": [0, 0, 5, 5], "iscrowd": 1},
        ],
        "categories": [{"id": 3, "name": "cat"}, {"id": 5, "name": "dog"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(data))

    from detr_tensorflow_tpu.data.coco_api import CocoIndex

    coco = CocoIndex(str(p))
    assert coco.getImgIds() == [7]
    assert sorted(coco.getCatIds()) == [3, 5]
    assert coco.loadImgs([7])[0]["file_name"] == "a.jpg"
    assert len(coco.loadAnnsForImage(7)) == 2
    assert coco.getAnnIds(7) == [1, 2]


def test_detr_model_save_load_roundtrip(tmp_path, rng):
    from detr_tensorflow_tpu.models import build_detr
    import jax
    import numpy as np

    model = build_detr(
        num_classes=4, num_queries=5, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(32, 32),
    )
    path = str(tmp_path / "m.npz")
    model.save(path)

    other = build_detr(
        num_classes=4, num_queries=5, head="detr",
        backbone_stage_sizes=(1, 1, 1, 1), image_size=(32, 32), seed=123,
    )
    # different init...
    a0 = np.asarray(jax.tree.leaves(other.params)[0])
    other.load(path)
    for x, y in zip(jax.tree.leaves(jax.device_get(model.variables)),
                    jax.tree.leaves(jax.device_get(other.variables))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # forward agrees
    img = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    o1 = model(img)
    o2 = other(img)
    np.testing.assert_allclose(np.asarray(o1["pred_logits"]),
                               np.asarray(o2["pred_logits"]), atol=1e-6)


def _fake_torchvision_resnet50_sd():
    """torchvision resnet50 state_dict naming/shapes, random values."""
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn((o, i, k, k), generator=g) * 0.05

    def bn(prefix, c):
        for s in ("weight", "bias", "running_mean"):
            sd[f"{prefix}.{s}"] = torch.randn((c,), generator=g) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand((c,), generator=g) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, (blocks, mid) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
        out = mid * 4
        for b in range(blocks):
            p = f"layer{s + 1}.{b}"
            conv(f"{p}.conv1", mid, in_ch if b == 0 else out, 1)
            bn(f"{p}.bn1", mid)
            conv(f"{p}.conv2", mid, mid, 3)
            bn(f"{p}.bn2", mid)
            conv(f"{p}.conv3", out, mid, 1)
            bn(f"{p}.bn3", out)
            if b == 0:
                conv(f"{p}.downsample.0", out, in_ch, 1)
                bn(f"{p}.downsample.1", out)
        in_ch = out
    # classifier head: must be ignored by the converter
    sd["fc.weight"] = torch.randn((1000, 2048), generator=g)
    sd["fc.bias"] = torch.randn((1000,), generator=g)
    return sd


def test_torchvision_backbone_init(tmp_path):
    """--backbone_weights loads a local torchvision resnet50 into the
    backbone (structural + value parity; reference detr.py:148 analog)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.models import build_detr

    sd = _fake_torchvision_resnet50_sd()
    path = tmp_path / "resnet50-imagenet.pth"
    torch.save(sd, str(path))

    model = build_detr(
        num_classes=5, num_queries=4, num_encoder_layers=1,
        num_decoder_layers=1, backbone_weights=str(path), image_size=(64, 64),
    )
    # Structure identical to a fresh init (same module): all leaf shapes
    # line up, so the optimizer partitioning sees the usual tree.
    fresh = build_detr(
        num_classes=5, num_queries=4, num_encoder_layers=1,
        num_decoder_layers=1, image_size=(64, 64),
    )
    jax.tree.map(
        lambda a, b: None if a.shape == b.shape else pytest.fail(f"{a.shape} vs {b.shape}"),
        model.variables["params"]["backbone"],
        fresh.variables["params"]["backbone"],
    )
    # Value + layout spot checks: OIHW -> HWIO stem conv, BN stats frozen.
    np.testing.assert_allclose(
        np.asarray(model.params["backbone"]["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.frozen["backbone"]["layer3"]["block_2"]["bn2"]["running_var"]),
        sd["layer3.2.bn2.running_var"].numpy(), atol=1e-6,
    )
    # Non-backbone params untouched by the graft; forward still runs.
    out = model(np.zeros((1, 64, 64, 3), np.float32))
    assert out["pred_logits"].shape == (1, 4, 5)
    assert bool(jnp.isfinite(out["pred_logits"]).all())


class TestDownloadWeights:
    """Egress-gated checkpoint acquisition (VERDICT r3 item 8): the
    registry + checksum gate work offline; the network path fails fast
    with actionable instructions when there is no egress."""

    def test_registry_entries_wellformed(self):
        from detr_tensorflow_tpu.models.weights import (
            PRETRAINED_CHECKPOINTS,
        )

        for name, entry in PRETRAINED_CHECKPOINTS.items():
            assert entry["url"].startswith("https://"), name
            # torch.hub convention: filename embeds the sha256 prefix.
            assert entry["sha256_prefix"] in entry["url"], name
            assert len(entry["sha256_prefix"]) == 8, name
        assert PRETRAINED_CHECKPOINTS["detr"] is \
            PRETRAINED_CHECKPOINTS["detr-r50"]

    def test_checksum_gate(self, tmp_path):
        import hashlib

        from detr_tensorflow_tpu.models.weights import verify_checksum

        f = tmp_path / "ckpt.pth"
        f.write_bytes(b"not really a checkpoint")
        good = hashlib.sha256(b"not really a checkpoint").hexdigest()[:8]
        verify_checksum(str(f), good)  # passes
        with pytest.raises(ValueError, match="checksum mismatch"):
            verify_checksum(str(f), "deadbeef")

    def test_download_verifies_and_caches(self, tmp_path):
        """A fake urlopen 'downloads' bytes; the file lands only after
        the checksum passes, and a second call skips the network."""
        import contextlib
        import hashlib
        import io

        from detr_tensorflow_tpu.models import weights as W

        payload = b"pretend torch checkpoint bytes"
        prefix = hashlib.sha256(payload).hexdigest()[:8]
        name = "_test_ckpt"
        W.PRETRAINED_CHECKPOINTS[name] = {
            "url": f"https://example.invalid/x-{prefix}.pth",
            "sha256_prefix": prefix,
        }
        calls = []

        def fake_urlopen(url, timeout=None):
            calls.append(url)
            return contextlib.closing(io.BytesIO(payload))

        try:
            path = W.download_weights(name, str(tmp_path),
                                      _urlopen=fake_urlopen)
            assert open(path, "rb").read() == payload
            assert not path.endswith(".part")
            path2 = W.download_weights(name, str(tmp_path),
                                       _urlopen=fake_urlopen)
            assert path2 == path and len(calls) == 1  # cache hit

            # Corrupt payload: rejected, nothing left behind.
            bad = dict(W.PRETRAINED_CHECKPOINTS[name],
                       sha256_prefix="00000000",
                       url="https://example.invalid/y-00000000.pth")
            W.PRETRAINED_CHECKPOINTS["_test_bad"] = bad
            with pytest.raises(ValueError, match="checksum mismatch"):
                W.download_weights("_test_bad", str(tmp_path),
                                   _urlopen=fake_urlopen)
        finally:
            W.PRETRAINED_CHECKPOINTS.pop(name, None)
            W.PRETRAINED_CHECKPOINTS.pop("_test_bad", None)

    def test_no_egress_fails_fast(self, tmp_path):
        from urllib.error import URLError

        from detr_tensorflow_tpu.models import weights as W

        def no_net(url, timeout=None):
            raise URLError("no route to host")

        with pytest.raises(ConnectionError, match="egress"):
            W.download_weights("detr-r50", str(tmp_path),
                               _urlopen=no_net)
        assert list(tmp_path.iterdir()) == []  # no .part litter

    def test_unknown_name_raises(self, tmp_path):
        from detr_tensorflow_tpu.models.weights import download_weights

        with pytest.raises(KeyError, match="registered"):
            download_weights("nope", str(tmp_path))
