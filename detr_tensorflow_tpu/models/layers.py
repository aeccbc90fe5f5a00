"""Shared building blocks: frozen batch-norm and the box-head MLP.

Reference equivalents: ``FrozenBatchNorm2D`` (detr_tf/networks/
custom_layers.py:4-28), the ``(out,in)``-layout ``Linear``
(custom_layers.py:31-54 — not needed here: our native layout is flax's
``(in, out)`` and the weight converter transposes), and ``FixedEmbedding``
(custom_layers.py:57-67).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference-style batch norm with frozen statistics and affine.

    All four tensors (weight, bias, running_mean, running_var) live in
    the ``frozen`` variable collection so no optimizer ever sees them —
    the flax-native equivalent of the reference's ``trainable=False``
    weights (custom_layers.py:12-21) and of ``disable_batchnorm_training``
    (optimizers.py:3-8). The affine transform folds to a single
    multiply-add which XLA fuses into the preceding conv.
    """

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    def _scale_shift(self, c: int):
        weight = self.variable("frozen", "weight", lambda: jnp.ones((c,), jnp.float32))
        bias = self.variable("frozen", "bias", lambda: jnp.zeros((c,), jnp.float32))
        mean = self.variable(
            "frozen", "running_mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "frozen", "running_var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = weight.value * jax.lax.rsqrt(var.value + self.eps)
        shift = bias.value - mean.value * scale
        return scale, shift

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale_shift_only: bool = False):
        scale, shift = self._scale_shift(x.shape[-1])
        if scale_shift_only:
            # For kernels that fold the affine elsewhere (fused bottleneck
            # tail): x is only consulted for the channel count.
            return scale, shift
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def feature_valid_mask(
    pixel_mask: jnp.ndarray, h: int, w: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Validity mask at a feature resolution, by exact conv arithmetic.

    The valid region is a top-left rectangle (bucket padding pads bottom/
    right). Every spatial downsample in the ResNet (stem conv, maxpool,
    strided 3x3s) maps a valid extent of n cells to ``(n - 1) // 2 + 1``
    (= ceil(n/2)) valid output cells — one *more* than a nearest-resized
    pixel mask marks for odd n, and zeroing that genuinely-valid cell is
    exactly the one-cell boundary error a resized mask introduces.
    Computing the chain on the actual valid extents makes padded and
    unpadded forwards agree for arbitrary image sizes, not just
    stride-aligned ones.

    Args:
      pixel_mask: (B, H, W) bool/float, True on the valid rectangle.
      h, w: target feature resolution; must lie on the ceil-halving
        chain of (H, W) (the backbone's downsample chain).

    Returns (B, h, w) ``dtype`` mask.
    """
    b, ph, pw = pixel_mask.shape
    if h == ph and w == pw:
        return pixel_mask.astype(dtype)
    levels = None
    hh, ww = ph, pw
    for k in range(1, 8):
        hh = (hh - 1) // 2 + 1
        ww = (ww - 1) // 2 + 1
        if (hh, ww) == (h, w):
            levels = k
            break
    assert levels is not None, (
        f"({h}, {w}) is not on the ceil-halving chain of ({ph}, {pw})"
    )
    vh = jnp.sum(pixel_mask[:, :, 0].astype(jnp.int32), axis=1)  # (B,)
    vw = jnp.sum(pixel_mask[:, 0, :].astype(jnp.int32), axis=1)
    for _ in range(levels):
        vh = (vh - 1) // 2 + 1
        vw = (vw - 1) // 2 + 1
    rows = jnp.arange(h, dtype=jnp.int32)[None, :] < vh[:, None]  # (B, h)
    cols = jnp.arange(w, dtype=jnp.int32)[None, :] < vw[:, None]  # (B, w)
    return (rows[:, :, None] & cols[:, None, :]).astype(dtype)


class MLP(nn.Module):
    """3-layer box head: Dense-relu x2 then Dense-sigmoid to 4 coords
    (reference detr.py:49-54, :75-79)."""

    hidden_dim: int = 256
    out_dim: int = 4
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name=f"layer_{self.num_layers - 1}")(x)
        return nn.sigmoid(x)
