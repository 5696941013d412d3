#!/usr/bin/env python
"""GELU variant timings in the MLP sublayer (the encoder's hidden hot spot).

encoder_decomposition.py showed the 12-layer MLP sublayer takes 13.2 ms of
the encoder's 18.2 ms while its matmuls need only ~5.7 ms at the measured
MXU rate — the exact-erf GELU (torch F.gelu default) burns ~6 ms of VPU
time on 604M hidden elements per batch. This measures drop-in alternatives
and their numeric distance from the exact form.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from parseq_tpu.models import vit
from parseq_tpu.ops.layers import layer_norm, linear


def timed(fwd, make_stack, trials=5, n_disp=8):
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


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_exact_f32(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_sigmoid(x):
    return x * jax.nn.sigmoid(1.702 * x)


def relu(x):
    return jnp.maximum(x, 0)


VARIANTS = [('exact_erf', gelu_exact), ('exact_erf_f32', gelu_exact_f32),
            ('tanh', gelu_tanh), ('sigmoid', gelu_sigmoid), ('relu', relu)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=4)
    args = ap.parse_args()

    cfg = vit.ViTConfig(img_size=(32, 128), patch_size=(4, 8), embed_dim=384,
                        depth=12, num_heads=6)
    params = vit.init(jax.random.key(0), cfg)
    L, D, B, M = cfg.num_patches, cfg.embed_dim, args.batch, args.macro

    def make_stack(seed):
        return jax.random.normal(jax.random.key(seed), (M, B, L, D), jnp.bfloat16)

    # numeric distance on a representative hidden-activation range
    xs = jnp.linspace(-6, 6, 20001, dtype=jnp.float32)
    ref = np.asarray(gelu_exact(xs))
    for name, act in VARIANTS[1:]:
        d = np.abs(np.asarray(act(xs)) - ref).max()
        print(f'max |{name} - exact_erf| on [-6,6] f32: {d:.2e}')
    # vs bf16 resolution of the same values
    q = np.abs(ref - np.asarray(ref.astype(jnp.bfloat16), np.float32)).max()
    print(f'bf16 quantization error of exact gelu: {q:.2e}')

    for name, act in VARIANTS:
        def block(p, x, act=act):
            h = layer_norm(p['norm2'], x)
            h = act(linear(p['mlp']['fc1'], h))
            return x + linear(p['mlp']['fc2'], h)

        def run(x, block=block):
            def body(x, bp):
                return block(bp, x), None
            return jax.lax.scan(body, x, params['blocks'])[0]

        fwd = jax.jit(lambda s, run=run: jax.lax.map(run, s))
        t = timed(fwd, make_stack) / M
        print(f'mlp_only[{name:13s}]: {t * 1e3:7.2f} ms/batch')


if __name__ == '__main__':
    main()
