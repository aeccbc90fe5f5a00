"""Native C++ data-plane kernels vs numpy reference."""

import numpy as np
import pytest

from detr_tensorflow_tpu.data import native, processing


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_normalize_torch_matches_numpy(lib, rng):
    img = rng.integers(0, 255, size=(123, 77, 3)).astype(np.uint8)
    fast = native.normalize_torch(img)
    ref = (img.astype(np.float32) / 255.0 - processing.IMAGENET_MEAN) / processing.IMAGENET_STD
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_normalize_caffe_matches_numpy(lib, rng):
    img = rng.integers(0, 255, size=(50, 61, 3)).astype(np.uint8)
    fast = native.normalize_caffe(img)
    ref = img.astype(np.float32)[..., ::-1] - processing.CAFFE_MEAN
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_normalize_into_bucket(lib, rng):
    img = rng.integers(0, 255, size=(100, 150, 3)).astype(np.uint8)
    out = native.normalize_torch_into_bucket(img, 128, 192)
    assert out.shape == (128, 192, 3)
    ref = (img.astype(np.float32) / 255.0 - processing.IMAGENET_MEAN) / processing.IMAGENET_STD
    np.testing.assert_allclose(out[:100, :150], ref, atol=1e-5)
    assert (out[100:] == 0).all() and (out[:, 150:] == 0).all()


def test_normalized_images_uses_fast_path(lib, rng):
    class Cfg:
        normalized_method = "torch_resnet"

    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    out = processing.normalized_images(img, Cfg())
    ref = (img.astype(np.float32) / 255.0 - processing.IMAGENET_MEAN) / processing.IMAGENET_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)
