"""Frozen-BN ResNet-50/101 backbones (stride-32, 2048 channels).

Same network family as the reference (detr_tf/networks/resnet_backbone.py:
torchvision geometry — 7x7/s2 stem + 3x3/s2 maxpool, bottleneck stacks
3/4/6/3 or 3/4/23/3, stride on the 3x3 conv, optional dilation in place
of stride), re-expressed as flax modules over NHWC tensors so XLA maps
the convolutions straight onto the MXU. Batch-norm statistics and affine
parameters live in the ``frozen`` collection (see layers.FrozenBatchNorm).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, feature_valid_mask
from ..ops.maxpool import max_pool_3x3_s2

Dtype = Any


class StemConv(nn.Module):
    """The 7x7/stride-2 stem convolution, with a space-to-depth fast path.

    A 3-channel convolution wastes almost the whole MXU contraction
    dimension (3 of 128 lanes). The classic TPU rewrite: space-to-depth
    the input by 2 (12 channels at half resolution) and convolve with an
    exactly-equivalent 4x4/stride-1 kernel derived from the original
    7x7 weights — same math. Measured on v5e through this environment's
    relay, XLA's native 7x7/s2 conv was already faster (12.2 vs 15.7
    ms/batch-32 at 800x1344 — XLA performs its own layout tricks), so the
    fast path defaults off; it remains available for other hardware. The parameter keeps the
    canonical (7, 7, 3, 64) layout so checkpoints and the torch weight
    converter are unaffected; the rearrangement is a tiny trace-time
    gather. Falls back to the direct convolution for odd spatial sizes.

    Derivation: y[p,q] = sum_{di,dj,c} K[di,dj,c] X[2p+di-3, 2q+dj-3].
    With X2[i,j,(a,b,c)] = X[2i+a, 2j+b, c] and di = 2*ei + a - 1,
    y[p,q] = sum_{ei,ej,a,b,c} K[2ei+a-1, 2ej+b-1, c] X2[p+ei-2, q+ej-2]
    i.e. a 4x4 stride-1 conv with padding (2, 1) and kernel
    K2[ei,ej,(a,b,c)] = Kpad[2ei+a, 2ej+b, c], Kpad = K zero-padded by
    one at the leading spatial edges.
    """

    dtype: Dtype = jnp.float32
    use_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, 64),
            jnp.float32,
        )
        b, h, w, c = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if self.use_s2d and h % 2 == 0 and w % 2 == 0 and c == 3:
            x2 = (
                x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c)
            )
            kpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,64)
            k2 = (
                kpad.reshape(4, 2, 4, 2, 3, 64)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 12, 64)
            )
            return jax.lax.conv_general_dilated(
                x2.astype(self.dtype), k2.astype(self.dtype),
                window_strides=(1, 1), padding=[(2, 1), (2, 1)],
                dimension_numbers=dn,
            )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=dn,
        )


class _Conv1x1Kernel(nn.Module):
    """Declares a 1x1 conv kernel with nn.Conv's exact parameter name,
    shape, and initializer — the fused bottleneck tail consumes the raw
    weight, so checkpoints stay interchangeable with the XLA path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, in_features, self.features),
            jnp.float32,
        )


class _ConvKernel(nn.Module):
    """Like _Conv1x1Kernel for arbitrary kernel sizes (the whole-block
    fused bottleneck consumes the raw 3x3 weight)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        k = self.kernel_size
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_features, self.features),
            jnp.float32,
        )


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1 bottleneck with frozen BN
    (reference resnet_backbone.py:94-136)."""

    dim1: int
    dim2: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    fuse_residual: bool = False  # Pallas fused conv3+bn3+add+relu tail
    fuse_bottleneck: bool = False  # Pallas whole-block fusion (inference)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: jnp.ndarray = None
    ) -> jnp.ndarray:
        conv = lambda f, k, s, d, name, pad: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d), padding=pad,
            use_bias=False, dtype=self.dtype, name=name,
        )
        if (
            self.fuse_bottleneck
            and not self.downsample
            and self.strides == 1
            and self.dilation == 1
            and valid is None
            and x.shape[-1] == self.dim2
            and not self.is_initializing()
        ):
            # Whole-block fusion: T1/T2 never leave VMEM
            # (ops/pallas/fused_bottleneck.py). Identical parameter tree:
            # the conv kernels are declared with nn.Conv's exact
            # shapes/names and the frozen-BN affines fold in.
            from ..ops.pallas import fused_bottleneck as fb

            bn = lambda name, dim: FrozenBatchNorm(  # noqa: E731
                dtype=self.dtype, name=name
            )(jnp.zeros((1, dim), self.dtype), scale_shift_only=True)
            k1 = _Conv1x1Kernel(self.dim1, name="conv1")(x.shape[-1])
            k2 = _ConvKernel(self.dim1, 3, name="conv2")(self.dim1)
            k3 = _Conv1x1Kernel(self.dim2, name="conv3")(self.dim1)
            w1, b1 = fb.fold_bn_params(k1, *bn("bn1", self.dim1))
            w2, b2 = fb.fold_bn_params(k2, *bn("bn2", self.dim1))
            w3, b3 = fb.fold_bn_params(k3, *bn("bn3", self.dim2))
            return fb.fused_bottleneck(
                x.astype(self.dtype), w1, b1, w2, b2, w3, b3
            )
        identity = x
        out = conv(self.dim1, 1, 1, 1, "conv1", "VALID")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        if valid is not None:
            # Bucket-padding exactness: the only spatial (halo-carrying)
            # conv in the block is conv2 — zeroing its input at padded
            # positions makes the halo read exactly the zeros an
            # unpadded SAME-convolution would, so valid-region outputs
            # are identical to an unpadded forward. (FrozenBN maps the
            # padded zeros to a nonzero constant otherwise.)
            out = out * valid[..., None].astype(out.dtype)
        d = self.dilation
        out = conv(self.dim1, 3, self.strides, d, "conv2", [(d, d), (d, d)])(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)

        if self.downsample:
            identity = conv(self.dim2, 1, self.strides, 1, "downsample_conv", "VALID")(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)

        if self.fuse_residual:
            # Inference fast path: the bottleneck tail (1x1 conv == matmul,
            # frozen-BN affine, residual join, relu) as one Pallas kernel —
            # the conv output never round-trips HBM
            # (ops/pallas/fused_residual.py). Identical parameter tree:
            # conv3/kernel declared with nn.Conv's exact shape/init, bn3
            # consulted for its scale/shift only.
            from ..ops.pallas import fused_residual

            kernel = _Conv1x1Kernel(self.dim2, name="conv3")(out.shape[-1])
            scale, shift = FrozenBatchNorm(dtype=self.dtype, name="bn3")(
                jnp.zeros((1, self.dim2), self.dtype), scale_shift_only=True
            )
            return fused_residual.conv1x1_bn_residual_relu(
                out, kernel.astype(self.dtype), scale, shift,
                identity.astype(self.dtype),
            )
        out = conv(self.dim2, 1, 1, 1, "conv3", "VALID")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """A stack of bottlenecks; the first downsamples (resnet_backbone.py:69-91)."""

    num_blocks: int
    dim1: int
    dim2: int
    strides: int = 1
    dilate: bool = False
    dtype: Dtype = jnp.float32
    fuse_residual: bool = False
    fuse_bottleneck: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pixel_mask: jnp.ndarray = None
    ) -> jnp.ndarray:
        def valid_at(h, w):
            # Exact conv-arithmetic validity at a feature resolution
            # (layers.feature_valid_mask). Identical computations across
            # blocks/stages are CSE'd by XLA into one.
            if pixel_mask is None:
                return None
            return feature_valid_mask(pixel_mask, h, w, dtype=self.dtype)

        strides, dilation = (1, 2) if self.dilate else (self.strides, 1)
        x = Bottleneck(
            self.dim1, self.dim2, strides=strides, downsample=True,
            dtype=self.dtype, fuse_residual=self.fuse_residual,
            fuse_bottleneck=self.fuse_bottleneck, name="block_0",
        )(x, valid=valid_at(*x.shape[1:3]))
        v = valid_at(*x.shape[1:3])
        for i in range(1, self.num_blocks):
            x = Bottleneck(
                self.dim1, self.dim2, dilation=dilation, dtype=self.dtype,
                fuse_residual=self.fuse_residual,
                fuse_bottleneck=self.fuse_bottleneck, name=f"block_{i}",
            )(x, valid=v)
        return x


class ResNetBackbone(nn.Module):
    """ResNet feature extractor: NHWC in, (B, H/32, W/32, 2048) out.

    With ``return_interm=True`` the call returns ``(c5, {"c2": ..,
    "c3": .., "c4": ..})`` — the stride-4/8/16 stage outputs the FPN-style
    segmentation head fuses (a capability beyond the reference, whose
    backbone exposes only the final map, resnet_backbone.py:20-32).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    dtype: Dtype = jnp.float32
    fuse_residual: bool = False  # Pallas fused bottleneck tails (inference)
    fuse_bottleneck: bool = False  # Pallas whole-block fusion (inference)
    return_interm: bool = False
    remat_stages: int = 0  # leading stages (0..4) whose interiors are
    # rematerialized in the backward pass: only the stage boundary
    # (c2..c5) activations survive the forward; intra-stage tensors are
    # recomputed. Measured round 4 (b8 376x672 train step, device
    # time): a *memory* lever only — remat=1 25.96 ms / 21.9 GB vs
    # baseline 25.05 / 21.0 (recompute re-adds traffic XLA's fusions
    # had already avoided). Use it to fit larger per-chip batches.
    stem_s2d: bool = False  # space-to-depth stem fast path (StemConv)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pixel_mask: jnp.ndarray = None):
        """pixel_mask (B, H, W) bool, True = valid: when supplied (bucket-
        padded evaluation/serving) every spatial conv's input is zeroed at
        padded positions, making valid-region features *identical* to an
        unpadded forward on divisor-aligned buckets — the TPU-native exact
        replacement for the reference's per-shape eager retrace
        (reference eval.py:41-58). The stem needs no masking: the image
        itself is zero-padded, matching SAME-padding semantics."""
        x = StemConv(dtype=self.dtype, use_s2d=self.stem_s2d,
                     name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if pixel_mask is not None:
            # Zero the FrozenBN constant beyond the valid extent so the
            # maxpool's straddling windows see 0 — since all activations
            # are post-relu (>= 0), max with an extra 0 equals the
            # unpadded SAME maxpool (which pads with -inf).
            v = feature_valid_mask(
                pixel_mask, x.shape[1], x.shape[2], dtype=self.dtype
            )
            x = x * v[..., None]
        # Forward-identical to nn.max_pool(3x3/s2/p1); custom gather VJP
        # replaces the select-and-scatter backward (2.75 -> 0.02 ms at the
        # b8 376x672 train shape, scripts/maxpool_probe.py).
        x = max_pool_3x3_s2(x)

        dims = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
        dilate = (False,) + tuple(self.replace_stride_with_dilation)
        interm = {}
        for s, (n_blocks, (d1, d2)) in enumerate(zip(self.stage_sizes, dims)):
            stage_cls = nn.remat(ResNetStage) if s < self.remat_stages \
                else ResNetStage
            x = stage_cls(
                n_blocks, d1, d2, strides=1 if s == 0 else 2, dilate=dilate[s],
                dtype=self.dtype, fuse_residual=self.fuse_residual,
                fuse_bottleneck=self.fuse_bottleneck,
                name=f"layer{s + 1}",
            )(x, pixel_mask=pixel_mask)
            if self.return_interm and s < 3:
                interm[f"c{s + 2}"] = x
        if self.return_interm:
            return x, interm
        return x


def resnet50_backbone(dtype=jnp.float32, dilation: bool = False) -> ResNetBackbone:
    """DETR-R50 backbone (resnet_backbone.py:35-49)."""
    return ResNetBackbone(
        stage_sizes=(3, 4, 6, 3),
        replace_stride_with_dilation=(False, False, dilation),
        dtype=dtype,
    )


def resnet101_backbone(dtype=jnp.float32, dilation: bool = False) -> ResNetBackbone:
    """DETR-R101 backbone (resnet_backbone.py:52-66)."""
    return ResNetBackbone(
        stage_sizes=(3, 4, 23, 3),
        replace_stride_with_dilation=(False, False, dilation),
        dtype=dtype,
    )
