#!/usr/bin/env python
"""Post-GELU forward-path decomposition: where do the ~20 ms/batch go now?

Stages timed separately (PARSeq-S, batch 256, bf16, macro-batched dispatch):
  encode        : ViT encoder (post GELU fix)
  encode+ar     : + fused AR decode
  encode+ar+ref : full production forward (bench.py path)
  refine alone  : one cloze refinement pass on fixed logits
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--macro', type=int, default=4)
    args = ap.parse_args()
    B, M = args.batch, args.macro

    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)

    def make_stack(seed):
        return jax.random.uniform(jax.random.key(seed),
                                  (M, B, *cfg.img_size, 3), jnp.float32)

    from parseq_tpu.ops.ar_kernel import ar_decode_fused

    def enc(x):
        return parseq.encode(params, cfg, x.astype(jnp.bfloat16))

    def enc_ar(x):
        return ar_decode_fused(params, cfg, enc(x).astype(jnp.bfloat16))

    def enc_ar_ref(x):
        m = enc(x).astype(jnp.bfloat16)
        logits = ar_decode_fused(params, cfg, m)
        return parseq.refine(params, cfg, m, logits, jnp.bfloat16)

    stages = {'encode': enc, 'encode+ar': enc_ar, 'encode+ar+refine': enc_ar_ref}
    res = {}
    for name, fn in stages.items():
        fwd = jax.jit(lambda s, fn=fn: jax.lax.map(fn, s))
        t = timed(fwd, make_stack) / M
        res[name] = t
        print(f'{name:17s}: {t * 1e3:7.2f} ms/batch  ({B / t:7.0f} img/s)')
    print(f'ar alone     ~ {1e3 * (res["encode+ar"] - res["encode"]):.2f} ms')
    print(f'refine alone ~ {1e3 * (res["encode+ar+refine"] - res["encode+ar"]):.2f} ms')


if __name__ == '__main__':
    main()
