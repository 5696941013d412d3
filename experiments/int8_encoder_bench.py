#!/usr/bin/env python
"""Int8 vs bf16 on the real chip: raw encoder-shape matmuls + full PARSeq.

v5e int8 MXU peak is 2x bf16 (394 vs 197 TOPS). This measures (a) whether
XLA actually hits the int8 path at the encoder's (B*L, 384) x (384, N)
shapes including the dynamic-quant overhead, and (b) what the full
PARSeq-S forward gains with a quantized encoder (ops/quant.py).
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
from parseq_tpu.ops import quant
from parseq_tpu.ops.layers import linear


def timed(fwd, inputs, trials=5):
    _ = jax.block_until_ready(fwd(inputs[-1]))
    ts = []
    n = len(inputs) - 1
    for t in range(trials):
        t0 = time.perf_counter()
        outs = [fwd(x) for x in inputs[:n]]
        _ = float(jnp.stack([o.ravel()[0].astype(jnp.float32) for o in outs]).sum())
        ts.append((time.perf_counter() - t0) / n)
    return min(ts)


def bench_matmuls(B=256, L=128, D=384):
    N = B * L
    rng = jax.random.key(0)
    p = {'w': jax.random.normal(rng, (D, 4 * D), jnp.float32) * 0.02,
         'b': jnp.zeros((4 * D,), jnp.float32)}
    q = quant.quantize_linear(p)
    xs = [jax.random.normal(jax.random.key(i), (N, D), jnp.bfloat16) for i in range(7)]

    f_bf16 = jax.jit(lambda x: linear(p, x))
    f_int8 = jax.jit(lambda x: linear(q, x))
    t_b = timed(f_bf16, xs)
    t_i = timed(f_int8, xs)
    gflop = 2 * N * D * 4 * D / 1e9
    print(f'matmul ({N}x{D})@({D}x{4*D}): bf16 {t_b*1e3:6.2f} ms ({gflop/t_b/1e3:5.1f} TF/s)  '
          f'int8(dyn) {t_i*1e3:6.2f} ms ({gflop/t_i/1e3:5.1f} TOP/s)')


def bench_parseq(B=256, macro=2):
    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = parseq.init(jax.random.key(0), cfg)
    qparams = dict(params, encoder=quant.quantize_vit_encoder(params['encoder']))

    def make(seed):
        return jax.random.uniform(jax.random.key(seed),
                                  (macro, B, *cfg.img_size, 3), jnp.float32)

    ins = [make(i) for i in range(7)]
    for name, pp in (('bf16', params), ('int8-encoder', qparams)):
        fwd = jax.jit(lambda s, pp=pp: jax.lax.map(
            lambda x: parseq.forward(pp, cfg, x, dtype=jnp.bfloat16), s))
        t = timed(fwd, ins) / macro
        print(f'parseq fwd {name:13s}: {t*1e3:6.2f} ms/batch ({B/t:7.0f} img/s)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip-full', action='store_true')
    args = ap.parse_args()
    bench_matmuls()
    if not args.skip_full:
        bench_parseq()


if __name__ == '__main__':
    main()
