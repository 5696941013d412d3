#!/usr/bin/env python
"""Honest encoder fwd / fwd+bwd at the production microbatch size.

Round 2 measured encoder fwd 20.4 / fwd+bwd 98.6 ms at bs=384 and called
the ~25 ms over a ~74 ms structural floor "lever #1". The production step
has since moved to m=4 in-jit microbatches (102 ms total), and the
decoder piece is slope-timed at 17.1 ms fwd+bwd — so the encoder side is
~85 ms. This slope-times (experiments/_timing.py) the encoder fwd and
fwd+bwd (remat on) at bs=96 and bs=384 to re-derive the true gap over the
structural remat floor (4x forward: fwd + recompute + 2x-fwd backward
matmuls) and decide whether a hand fwd+bwd block kernel has enough
upside to outweigh its known failure history (ops/flash_bwd.py Mosaic
bug; forward mega-kernel weight-streaming loss).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import slope_ms
from parseq_tpu.models import parseq


def main():
    base = parseq.PARSeqConfig(num_tokens=97)
    cfg = dataclasses.replace(base, remat=True)
    params = parseq.init(jax.random.key(0), base)

    for bs in (96, 384):
        reps = 384 // bs
        im0 = jax.random.uniform(jax.random.key(7), (bs, *base.img_size, 3),
                                 jnp.float32)
        # fixed random cotangent so the pullback is generic (a ones-cotangent
        # lets XLA simplify the last matmul's transpose)
        T = (cfg.img_size[0] // cfg.vit.patch_size[0]) * (
            cfg.img_size[1] // cfg.vit.patch_size[1])
        cot = jax.random.normal(jax.random.key(8), (bs, T, cfg.embed_dim),
                                jnp.float32) * 0.01

        def enc_loss(p, x):
            out = parseq.encode(p, cfg, x.astype(jnp.bfloat16))
            return jnp.sum(out.astype(jnp.float32) * cot)

        def fwd_body(i, key):
            im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
            return enc_loss(params, im)

        def bwd_body(i, key):
            im = im0 * (1.0 + 0.001 * i.astype(jnp.float32))
            g = jax.grad(enc_loss)(params, im)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

        n2 = 20 if bs == 384 else 40
        t_fwd = slope_ms(fwd_body, n1=n2 // 4, n2=n2) * reps
        t_bwd = slope_ms(bwd_body, n1=n2 // 4, n2=n2) * reps
        print(f'bs={bs}: encoder fwd {t_fwd:6.2f} ms  fwd+bwd {t_bwd:6.2f} ms '
              f'(per effective-384; remat floor ~= 4x fwd = {4*t_fwd:5.1f})',
              flush=True)


if __name__ == '__main__':
    main()
