#!/usr/bin/env python
"""Split TRBA's TPS stage cost: localization net vs grid solve vs grid_sample.

Round-2 profiling (experiments/trba_decomposition.py) showed TPS alone costs
35.5 ms/batch at B=256 — more than the 32-layer ResNet. This narrows down
which piece pays it.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import trba
from parseq_tpu.ops import cnn
from parseq_tpu.ops.grid_sample import grid_sample
from parseq_tpu.ops.layers import linear


def timed(fwd, make_stack, trials=5, n_disp=6):
    _ = float(fwd(make_stack(999)).sum())
    times = []
    for t in range(trials):
        stacks = [make_stack(1000 * t + i) for i in range(n_disp)]
        _ = float(jnp.stack([s.sum() for s in stacks]).sum())
        t0 = time.perf_counter()
        outs = [fwd(s) for s in stacks]
        _ = float(jnp.stack([o.sum() for o in outs]).sum())
        times.append((time.perf_counter() - t0) / n_disp)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=2)
    args = ap.parse_args()
    B, M = args.batch, args.macro

    cfg = trba.TRBAConfig(num_tokens=97)
    params, stats = trba.init(jax.random.key(0), cfg)
    constants = trba.tps_constants(cfg)
    loc, loc_s = params['loc'], stats['loc']

    def make_stack(seed):
        return jax.random.uniform(jax.random.key(seed),
                                  (M, B, *cfg.img_size, 3), jnp.float32)

    def loc_ctrl(x):
        """Localization net -> fiducial points (B, F, 2)."""
        x = x.astype(jnp.bfloat16)
        for i in range(4):
            x = cnn.conv2d(loc[f'conv{i}']['conv'], x, stride=(1, 1), padding=(1, 1))
            x, _ = cnn.batchnorm(loc[f'conv{i}']['bn'], loc_s[f'conv{i}'], x, train=False)
            x = jax.nn.relu(x)
            if i < 3:
                x = cnn.max_pool2d(x, (2, 2), (2, 2))
        x = jnp.mean(x, axis=(1, 2))
        x = jax.nn.relu(linear(loc['fc1'], x))
        return linear(loc['fc2'], x).reshape(-1, cfg.num_fiducial, 2)

    def grid_of(x):
        C_prime = loc_ctrl(x)
        inv_delta_C, P_hat = constants
        Bx = C_prime.shape[0]
        Cz = jnp.concatenate([C_prime, jnp.zeros((Bx, 3, 2), C_prime.dtype)], axis=1)
        T = inv_delta_C.astype(C_prime.dtype) @ Cz
        P_prime = jnp.einsum('nf,bfd->bnd', P_hat.astype(C_prime.dtype), T)
        return P_prime.reshape(Bx, cfg.img_size[0], cfg.img_size[1], 2)

    def s_locnet(x):
        return loc_ctrl(x)

    def s_grid(x):
        return grid_of(x)

    def s_full(x):
        return grid_sample(x.astype(jnp.bfloat16), grid_of(x))

    def s_sample_fixed(x):
        # grid_sample alone: fixed grid (identity-ish), isolates the gather cost
        g = jnp.tile(jnp.stack(jnp.meshgrid(
            jnp.linspace(-1, 1, cfg.img_size[1]),
            jnp.linspace(-1, 1, cfg.img_size[0])), axis=-1)[None],
            (x.shape[0], 1, 1, 1)) * 0.9
        return grid_sample(x.astype(jnp.bfloat16), g)

    for name, fn in [('locnet', s_locnet), ('locnet+gridsolve', s_grid),
                     ('gather only (fixed grid)', s_sample_fixed),
                     ('full tps', s_full)]:
        fwd = jax.jit(lambda s, fn=fn: jax.lax.map(fn, s))
        t = timed(fwd, make_stack) / M
        print(f'{name:26s}: {t * 1e3:7.2f} ms/batch ({B / t:7.0f} img/s)')


if __name__ == '__main__':
    main()
