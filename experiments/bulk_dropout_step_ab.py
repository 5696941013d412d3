#!/usr/bin/env python
"""A/B the full production train step with and without bulk_dropout_bits.

Slope-timed with state chained through the scan (same harness as
step_decomposition_honest.py) so the comparison is the real end-to-end
step: grads (m=4 microbatches) + AdamW/OneCycle update at bs=384.
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


def main():
    bs, m = 384, 4
    tok = Tokenizer(CHARS)
    nprng = np.random.default_rng(0)

    im0 = jax.random.uniform(jax.random.key(7), (bs, 32, 128, 3), jnp.float32)
    labels = [''.join(nprng.choice(list(CHARS), size=nprng.integers(1, 25)))
              for _ in range(bs)]

    for bulk in (False, True):
        cfg = parseq.PARSeqConfig(num_tokens=97, remat=True,
                                  bulk_dropout_bits=bulk)
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

        t = slope_chain(full_step, state, 3, 9)
        print(f'full step bulk_dropout_bits={bulk!s:5}: {t:7.2f} ms '
              f'({bs/t*1000:,.0f} img/s)', flush=True)


if __name__ == '__main__':
    main()
