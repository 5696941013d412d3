"""Bilinear grid sampling (torch F.grid_sample equivalent), TPU-native.

TPU-native replacement for the TPS warp (SURVEY.md §2.4;
/root/reference/strhub/models/trba/transformation.py:35). Semantics match
``F.grid_sample(..., mode='bilinear', padding_mode='border',
align_corners=True)``: grid coords in [-1, 1], (x, y) order in the last dim.
Differentiable (gradients flow to both images and grid; floor() contributes
zero grad, matching torch).

Two implementations:

- ``method='onehot'`` (default): the exact bilinear sum
  ``out[b,i,j,c] = sum_y sum_x wy[b,i,j,y] * wx[b,i,j,x] * img[b,y,x,c]``
  where wy/wx are 2-nonzero interpolation rows, evaluated as a batched
  matmul over y (rides the MXU) followed by a multiply-reduce over x.
  Chosen because XLA's gather on a (B, H*W, C<=3) array is lane-padded
  (each (8,128) tile holds C valid lanes) and measured 32 ms/batch at
  B=256 on v5e, vs ~2 ms for this formulation
  (experiments/tps_decomposition.py).
- ``method='gather'``: 4 corner gathers + lerp; kept as the
  semantics-defining reference path (used by parity tests and for large-C
  inputs where the one-hot intermediate would dominate).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _corner_weights(coord, size):
    """1-D bilinear corner indices/weights with border clamping.

    coord: fractional pixel positions already clamped to [0, size-1].
    Returns (i0, i1, frac) with i1 = min(i0+1, size-1).
    """
    i0 = jnp.clip(jnp.floor(coord), 0, size - 1)
    i1 = jnp.clip(i0 + 1, 0, size - 1)
    return i0.astype(jnp.int32), i1.astype(jnp.int32), coord - i0


def _unnormalize(grid, H, W):
    """[-1, 1] (x, y) grid -> pixel coords, align_corners=True + border clamp."""
    x = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    return jnp.clip(x, 0.0, W - 1), jnp.clip(y, 0.0, H - 1)


def grid_sample(images, grid, method='auto'):
    """images: (B, H, W, C) NHWC. grid: (B, Hg, Wg, 2) with (x, y) in [-1, 1].
    Returns (B, Hg, Wg, C).

    method: 'onehot' | 'gather' | 'auto' (onehot for few-channel images where
    the (B, Hg, Wg, H, C) intermediate stays small — the TPS C=3 case — and
    gather for feature-map-like inputs with many channels)."""
    if method == 'auto':
        method = 'onehot' if images.shape[-1] <= 8 else 'gather'
    if method == 'onehot':
        return _grid_sample_onehot(images, grid)
    return _grid_sample_gather(images, grid)


def _interp_onehot(idx0, idx1, frac, size, dtype):
    """(..., ) corner indices/frac -> (..., size) 2-nonzero interpolation row."""
    iota = jnp.arange(size, dtype=jnp.int32)
    f = frac.astype(dtype)[..., None]
    w = (jnp.where(idx0[..., None] == iota, 1.0, 0.0).astype(dtype) * (1 - f)
         + jnp.where(idx1[..., None] == iota, 1.0, 0.0).astype(dtype) * f)
    return w


def _grid_sample_onehot(images, grid):
    B, H, W, C = images.shape
    Hg, Wg = grid.shape[1:3]
    x, y = _unnormalize(grid, H, W)
    x0, x1, fx = _corner_weights(x, W)
    y0, y1, fy = _corner_weights(y, H)

    dt = images.dtype
    wy = _interp_onehot(y0, y1, fy, H, dt)          # (B, Hg, Wg, H)
    wx = _interp_onehot(x0, x1, fx, W, dt)          # (B, Hg, Wg, W)

    # x-contraction as one batched matmul: (B, Hg*Wg, W) @ (B, W, H*C).
    # Contracting the wider axis first keeps the MXU contraction deep and
    # the (B, Hg*Wg, H, C) intermediate H/W-fold smaller than the y-first
    # ordering (typ. W=128 vs H=32 for STR shapes). For f32 inputs force
    # full-precision dots — the MXU's default bf16-truncated passes would
    # silently cost ~4 digits vs the gather path's pure-elementwise math.
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    xmix = jnp.einsum('bnx,bxk->bnk', wx.reshape(B, Hg * Wg, W),
                      images.transpose(0, 2, 1, 3).reshape(B, W, H * C),
                      precision=prec)
    xmix = xmix.reshape(B, Hg, Wg, H, C)
    # y-stage: multiply by the 2-nonzero y-row and reduce (fuses on the VPU)
    return jnp.sum(xmix * wy[..., None], axis=3)


def _grid_sample_gather(images, grid):
    B, H, W, C = images.shape
    x, y = _unnormalize(grid, H, W)
    x0i, x1i, wx = _corner_weights(x, W)
    y0i, y1i, wy = _corner_weights(y, H)

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
