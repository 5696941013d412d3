#!/usr/bin/env python
"""Dropout-application lever (VERDICT r3 item 3): ~6 ms/step bound.

Round-3 decomposition: at bs=384 m=4 the production step with dropout on
costs ~6.2 ms more than with dropout off; bit GENERATION is cheap (one
RngBitGenerator per site with bulk_dropout_bits), so the residue is mask
APPLICATION: every site reads x (bf16) + bits (uint16 = same bytes as x!)
and writes x, across 6 perms x 6 decoder sites x several layers.

Cheap variants measured here on the FULL production step (slope-timed,
state chained — same harness as bulk_dropout_step_ab.py):
  A. production: bulk uint16 bits             (round-3 default, 98.1 ms)
  B. bulk uint8 bits (bulk_bits_uint8=True)   halves bits HBM traffic;
     drop rate quantizes to round(p*256)/256 with the survivor scale
     using the quantized keep rate -> still exactly unbiased
  C. dropout=0.0                              the floor / upside bound

Decoder-fwd-only A/B (6 perms, no grad) is also printed: deltas of a few
ms resolve better there than under the ~100 ms full step.

Run: python experiments/dropout_fusion_levers.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.data import Tokenizer
from parseq_tpu.models import parseq
from parseq_tpu.train import families, optim, steps
from step_decomposition_honest import slope_chain

CHARS = ''.join(chr(c) for c in range(33, 127))


def full_step_ms(cfg, bs=384, m=4):
    tok = Tokenizer(CHARS)
    nprng = np.random.default_rng(0)
    im0 = jax.random.uniform(jax.random.key(7), (bs, 32, 128, 3), jnp.float32)
    labels = [''.join(nprng.choice(list(CHARS), size=nprng.integers(1, 25)))
              for _ in range(bs)]
    params = parseq.init(jax.random.key(0), cfg)
    fam = families.FAMILIES['parseq']
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=1000)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    train_step = steps.make_train_step(fam, cfg, tx, microbatches=m)
    tgt = jnp.asarray(tok.encode(labels, cfg.max_label_length))
    perms = jnp.asarray(parseq.gen_tgt_perms(nprng, cfg))

    def full_step(carry, i, key):
        st = carry
        im = im0 * (1.0 + 1e-4 * i.astype(jnp.float32))
        b = {'images': im, 'tgt': tgt, 'perms': perms}
        st, metrics = train_step(st, b, key)
        return st, metrics['loss'] * 1e-6

    return slope_chain(full_step, state, 3, 9)


def decoder_fwd_ms(cfg, bs=384):
    nprng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), cfg)
    tgt = jnp.asarray(nprng.integers(0, 90, (bs, cfg.max_label_length + 2)),
                      jnp.int32)
    perms = jnp.asarray(parseq.gen_tgt_perms(nprng, cfg))
    im = jax.random.uniform(jax.random.key(1), (bs, *cfg.img_size, 3),
                            jnp.float32)

    def fwd(carry, i, key):
        images = im * (1.0 + 1e-4 * i.astype(jnp.float32))
        loss, _ = parseq.multi_perm_loss(params, cfg, images, tgt, perms,
                                         rng=key)
        return carry, loss * 1e-6

    return slope_chain(fwd, jnp.zeros(()), 4, 12)


def main():
    base = parseq.PARSeqConfig(num_tokens=97, remat=True)
    variants = [
        ('A bulk uint16 (prod)', base),
        ('B bulk uint8', dataclasses.replace(base, bulk_bits_uint8=True)),
        ('C dropout off (floor)', dataclasses.replace(base, dropout=0.0)),
    ]

    print('=== decoder fwd only (6-perm loss, bs=384, no grad) ===')
    for name, cfg in variants:
        t = decoder_fwd_ms(cfg)
        print(f'{name:24s} {t:7.2f} ms', flush=True)

    print('=== full production step (bs=384, m=4) ===')
    for name, cfg in variants:
        t = full_step_ms(cfg)
        print(f'{name:24s} {t:7.2f} ms ({384/t*1000:,.0f} img/s)', flush=True)


if __name__ == '__main__':
    main()
