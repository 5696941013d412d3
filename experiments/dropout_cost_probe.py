#!/usr/bin/env python
"""Isolate WHERE the residual dropout cost in the PARSeq train fwd lives.

After the uint16-bits switch, 6-perm decoder fwd is ~23.5 ms with dropout
vs 13.1 ms without (bs=384). Candidates: (a) RngBitGenerator calls acting
as fusion barriers -> test by feeding a single pregenerated bits pool
(zero RNG ops in the graph); (b) the select/scale work itself.

If 'pooled bits' ~= 'no dropout' + a few ms, a mask-pool refactor recovers
the gap; if it stays ~20 ms, the cost is the selects and not worth plumbing.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq
from parseq_tpu.ops import layers


def main():
    base = parseq.PARSeqConfig(num_tokens=97)
    cfg = dataclasses.replace(base, remat=True)
    rng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), base)
    bs = 384
    tgt = jnp.asarray(rng.integers(0, 90, (bs, base.max_label_length + 2)), jnp.int32)
    perms = jnp.asarray(parseq.gen_tgt_perms(rng, base))
    tgt_in = tgt[:, :-1]
    pad = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)

    ims = [jax.random.uniform(jax.random.key(i), (bs, *base.img_size, 3), jnp.float32)
           for i in range(17)]
    enc = jax.jit(lambda x: parseq.encode(params, cfg, x.astype(jnp.bfloat16)))
    mems = [enc(x) for x in ims]
    jax.block_until_ready(mems[-1])
    print('mems ready', flush=True)

    pool = jax.random.bits(jax.random.key(7), (1 << 22,), jnp.uint16)

    def pooled_dropout(x, rate, rng=None):
        if rng is None or rate == 0.0:
            return x
        keep = 1.0 - rate
        thr = int(round(rate * 65536.0))
        n = int(np.prod(x.shape))
        bits = jax.lax.dynamic_slice(pool, (0,), (min(n, pool.shape[0]),))
        if n > pool.shape[0]:
            reps = -(-n // pool.shape[0])
            bits = jnp.tile(bits, reps)[:n]
        else:
            bits = bits[:n]
        return jnp.where(bits.reshape(x.shape) >= thr, x / keep, 0).astype(x.dtype)

    def bench(label, impl):
        orig = layers.dropout
        import parseq_tpu.models.parseq as pq
        layers.dropout = impl
        pq.dropout = impl
        try:
            def dec6(args):
                memory, r = args
                cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

                def one(cbi, qbi, ri):
                    out = parseq.decode(params, cfg, tgt_in, memory, query_bias=qbi,
                                        content_bias=cbi, padding_mask=pad,
                                        dtype=jnp.bfloat16, drop=cfg.dropout, rng=ri)
                    return parseq.head(params, out)
                return jax.vmap(one)(cb, qb,
                                     jnp.stack(list(jax.random.split(r, perms.shape[0]))))
            d6 = jax.jit(dec6)
            din = [(m, jax.random.key(100 + i, impl='unsafe_rbg'))
                   for i, m in enumerate(mems)]
            o = d6(din[-1])
            jax.block_until_ready(o)
            ts = []
            for t in range(2):
                sub = din[t * 8:(t + 1) * 8]
                t0 = time.perf_counter()
                outs = [d6(a) for a in sub]
                _ = float(jnp.stack([o.ravel()[0] for o in outs]).sum())
                ts.append((time.perf_counter() - t0) / 8)
            print(f'{label:28s}: {min(ts)*1e3:6.1f} ms', flush=True)
        finally:
            layers.dropout = orig
            pq.dropout = orig

    bench('uint16 rng dropout (today)', layers.dropout)
    bench('pooled constant bits', pooled_dropout)
    bench('no dropout', lambda x, rate, rng=None: x)


if __name__ == '__main__':
    main()
