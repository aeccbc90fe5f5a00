"""2-D sine/cosine positional embeddings.

Pure function of the validity mask, matching the reference
``PositionEmbeddingSine.call`` (detr_tf/networks/position_embeddings.py:
23-50): cumulative-sum coordinates over valid pixels, normalized to a
2*pi scale, temperature 10000, interleaved sin/cos per axis, y features
before x features.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


def sine_position_embedding(
    valid_mask: Array,
    num_pos_features: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    eps: float = 1e-6,
    dtype=jnp.float32,
) -> Array:
    """Build (B, H, W, 2*num_pos_features) positional features.

    Args:
      valid_mask: (B, H, W) — 1.0/True for real pixels, 0 for padding.
        (The reference passes the *padding* mask and negates it,
        position_embeddings.py:24; we take validity directly.)
    """
    if scale is None:
        scale = 2 * np.pi
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_features, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_features)

    pos_x = x_embed[..., None] / dim_t  # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    # Interleave sin on even features, cos on odd features.
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(pos_x.shape[:3] + (-1,))
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(pos_y.shape[:3] + (-1,))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
