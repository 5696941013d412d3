#!/usr/bin/env python
"""Split the PARSeq-S training BACKWARD cost (bs=384, K=6 perms, bf16).

Round-2 forward decomposition: encoder 20.4 / decoder(6-perm, dropout)
27.7 ms; full fwd+bwd 150 ms => bwd ~102 ms. This measures grad cost of
each half separately (encoder with remat, decoder given fixed memory) to
see where bwd exceeds the ~2x-of-forward theoretical ratio.
"""

import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np

import jax
import jax.numpy as jnp

from parseq_tpu.models import parseq


def timed(fn, inputs, n=8, trials=2):
    o = fn(inputs[-1])
    jax.block_until_ready(o)
    ts = []
    for t in range(trials):
        sub = inputs[t * n:(t + 1) * n]
        t0 = time.perf_counter()
        outs = [fn(a) for a in sub]
        jax.block_until_ready(outs[-1])
        _ = float(jax.tree.leaves(outs[-1])[0].ravel()[0])
        ts.append((time.perf_counter() - t0) / n)
    return min(ts) * 1e3


def main():
    base = parseq.PARSeqConfig(num_tokens=97)
    cfg = dataclasses.replace(base, remat=True)
    rng = np.random.default_rng(0)
    params = parseq.init(jax.random.key(0), base)
    bs = 384
    key = jax.random.key(1, impl='unsafe_rbg')

    tgt = jnp.asarray(rng.integers(0, 90, (bs, base.max_label_length + 2)), jnp.int32)
    perms = jnp.asarray(parseq.gen_tgt_perms(rng, base))
    tgt_in = tgt[:, :-1]
    tgt_out = tgt[:, 1:]
    pad = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)

    ims = [jax.random.uniform(jax.random.key(i), (bs, *base.img_size, 3), jnp.float32)
           for i in range(17)]

    # -- encoder fwd+bwd (remat on), scalar head so bwd runs full stack
    def enc_loss(p, x):
        return jnp.sum(parseq.encode(p, cfg, x.astype(jnp.bfloat16)).astype(jnp.float32))

    g_enc = jax.jit(lambda x: jax.grad(enc_loss)(params, x))
    print(f'encoder fwd+bwd (remat)   : {timed(g_enc, ims):7.1f} ms', flush=True)

    cfg_nr = dataclasses.replace(base, remat=False)
    g_enc_nr = jax.jit(lambda x: jax.grad(
        lambda p, xx: jnp.sum(parseq.encode(p, cfg_nr, xx.astype(jnp.bfloat16)).astype(jnp.float32))
    )(params, x))
    try:
        print(f'encoder fwd+bwd (no remat): {timed(g_enc_nr, ims):7.1f} ms', flush=True)
    except Exception as e:  # noqa: BLE001
        print(f'encoder fwd+bwd (no remat): FAILED {type(e).__name__}', flush=True)

    # -- decoder 6-perm fwd+bwd given fixed memory
    enc = jax.jit(lambda x: parseq.encode(params, cfg, x.astype(jnp.bfloat16)))
    mems = [enc(x) for x in ims]
    jax.block_until_ready(mems[-1])

    def dec_loss(p, memory, r):
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def one(cbi, qbi, ri):
            out = parseq.decode(p, cfg, tgt_in, memory, query_bias=qbi, content_bias=cbi,
                                padding_mask=pad, dtype=jnp.bfloat16,
                                drop=cfg.dropout, rng=ri)
            return parseq.head(p, out)
        logits = jax.vmap(one)(cb, qb, jnp.stack(list(jax.random.split(r, perms.shape[0]))))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(perms.shape[0], 0), axis=-1)[..., 0]
        return jnp.mean(nll)

    g_dec = jax.jit(lambda m: jax.grad(dec_loss)(params, m, key))
    print(f'decoder x6 fwd+bwd (drop) : {timed(g_dec, mems):7.1f} ms', flush=True)

    def dec_loss_nd(p, memory):
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def one(cbi, qbi):
            out = parseq.decode(p, cfg, tgt_in, memory, query_bias=qbi, content_bias=cbi,
                                padding_mask=pad, dtype=jnp.bfloat16)
            return parseq.head(p, out)
        logits = jax.vmap(one, in_axes=(0, 0))(cb, qb)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(perms.shape[0], 0), axis=-1)[..., 0]
        return jnp.mean(nll)

    g_dec_nd = jax.jit(lambda m: jax.grad(dec_loss_nd)(params, m))
    print(f'decoder x6 fwd+bwd no-drop: {timed(g_dec_nd, mems):7.1f} ms', flush=True)

    # -- decoder with remat over the whole decode (trade recompute for
    #    saved-intermediate bandwidth, like the encoder)
    def dec_loss_remat(p, memory, r):
        f = jax.checkpoint(lambda pp: dec_loss(pp, memory, r))
        return f(p)

    g_dec_r = jax.jit(lambda m: jax.grad(dec_loss_remat)(params, m, key))
    print(f'decoder x6 fwd+bwd remat  : {timed(g_dec_r, mems):7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
