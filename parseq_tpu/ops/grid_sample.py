"""Bilinear grid sampling (torch F.grid_sample equivalent) via gathers.

TPU-native replacement for the TPS warp (SURVEY.md §2.4;
/root/reference/strhub/models/trba/transformation.py:35). Semantics match
``F.grid_sample(..., mode='bilinear', padding_mode='border',
align_corners=True)``: grid coords in [-1, 1], (x, y) order in the last dim.
Differentiable (pure gather + lerp).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(images, grid):
    """images: (B, H, W, C) NHWC. grid: (B, Hg, Wg, 2) with (x, y) in [-1, 1].
    Returns (B, Hg, Wg, C)."""
    B, H, W, C = images.shape
    x = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (W - 1)  # align_corners=True
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    # border padding: clamp
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = x - x0
    wy = y - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    def gather(yi, xi):
        # flatten spatial dims; one gather per corner
        flat = images.reshape(B, H * W, C)
        idx = (yi * W + xi).reshape(B, -1)  # (B, Hg*Wg)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(*yi.shape, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None].astype(images.dtype)
    wy = wy[..., None].astype(images.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
