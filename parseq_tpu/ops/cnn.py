"""Convolutional ops: conv2d / max-pool / batchnorm, NHWC layout.

NHWC is the TPU-native layout (XLA maps these onto the MXU via implicit
im2col). Weight layout: (kh, kw, cin, cout); the torch converter transposes
Conv2d's (cout, cin, kh, kw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parseq_tpu.ops import layers


def conv2d_init(key, kh, kw, cin, cout, *, bias=True):
    p = {'w': layers.kaiming_normal_conv(key, (kh, kw, cin, cout))}
    if bias:
        p['b'] = jnp.zeros((cout,), jnp.float32)
    return p


def conv2d(p, x, *, stride=(1, 1), padding=(0, 0)):
    """x: (B, H, W, C). padding: int pairs per spatial dim (torch-style)."""
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, p['w'].astype(x.dtype), window_strides=stride, padding=pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    if 'b' in p:
        y = y + p['b'].astype(x.dtype)
    return y


def max_pool2d(x, kernel, stride=None, padding=(0, 0)):
    """torch MaxPool2d semantics (floor mode, -inf padding)."""
    stride = stride or kernel
    neg = -float('inf') if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kernel[0], kernel[1], 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)),
    )


def batchnorm_init(c):
    return {
        'scale': jnp.ones((c,), jnp.float32),
        'bias': jnp.zeros((c,), jnp.float32),
    }


def batchnorm_stats_init(c):
    return {'mean': jnp.zeros((c,), jnp.float32), 'var': jnp.ones((c,), jnp.float32)}


def batchnorm(p, stats, x, *, train=False, momentum=0.1, eps=1e-5, axes=(0, 1, 2)):
    """BatchNorm2d. Returns (y, new_stats). Eval uses running stats;
    train uses batch stats and updates the running ones (torch momentum
    convention: new = (1-m)*old + m*batch)."""
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axes)
        var = jnp.var(x32, axes)
        n = x.size / mean.size
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            'mean': (1 - momentum) * stats['mean'] + momentum * mean,
            'var': (1 - momentum) * stats['var'] + momentum * unbiased,
        }
    else:
        mean, var = stats['mean'], stats['var']
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps) * p['scale']
    y = (x.astype(jnp.float32) - mean) * inv + p['bias']
    return y.astype(x.dtype), new_stats
