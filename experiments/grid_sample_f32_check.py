#!/usr/bin/env python
"""On-TPU check: onehot grid_sample f32 path matches gather to f32 noise.

Guards the Precision.HIGHEST fix — without it the MXU's default bf16
truncation cost ~4 digits (max diff ~4e-3) on the f32 path; with it both
paths agree to ~1e-6. CPU parity tests can't catch this (CPU dots are f32).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.ops.grid_sample import grid_sample


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((4, 32, 128, 3)), jnp.float32)
    grid = jnp.asarray(rng.random((4, 32, 128, 2)) * 1.8 - 0.9, jnp.float32)
    a = jax.jit(lambda i, g: grid_sample(i, g, method='onehot'))(imgs, grid)
    b = jax.jit(lambda i, g: grid_sample(i, g, method='gather'))(imgs, grid)
    diff = float(jnp.abs(a - b).max())
    print(f'platform={jax.devices()[0].platform} f32 onehot-vs-gather max diff: {diff:.2e}')
    assert diff < 5e-5, diff
    print('OK')


if __name__ == '__main__':
    main()
