#!/usr/bin/env python
"""6-perm decoder training-forward decomposition (VERDICT r2 lever #3/#6).

The PARSeq training step vmaps the (single-layer, two-stream) decoder over
K=6 permutations (models/parseq.py:multi_perm_loss). Round-2 measured this
at 13.1 ms/bs=384 forward against a ~2 ms pure-matmul floor (~20% MXU).
This experiment isolates the decoder+head+loss piece at the production
microbatch size (bs=96, m=4) with sublayer ablations and layout variants,
to decide whether a fused two-stream kernel / perm-fold layout is worth
building, and what its upper bound is.

Everything is timed with a device-resident precomputed memory so the
encoder is out of the picture.

TIMING CORRECTION (round 3): the first version of this script timed
independent per-call dispatches with block_until_ready, which under the
axon relay does not synchronize and produced numbers as low as 6x over
chip peak (see relay_timing_calibration.py). All measurements now go
through experiments/_timing.slope_ms — an in-jit lax.scan at two lengths
whose time difference cancels every per-dispatch constant. The original
table's ratios (e.g. "7.25 ms at bs=96 vs 13.1 ms at bs=384") were
artifacts; honest numbers show the piece is flat in batch size per
effective image (decoder_bwd_scaling.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from _timing import slope_ms
from parseq_tpu.models import parseq
from parseq_tpu.ops import layers
from parseq_tpu.ops.layers import layer_norm, linear, mha, dropout


def make_timed(base):
    """Returns timed(fn): slope-timed ms/evaluation of fn(memory, tgt,
    perms, key). Memory is perturbed per iteration and the rng key folded
    so no two scan iterations share inputs."""
    memory0, tgt, perms, _ = base

    def timed(fn):
        def body(i, key):
            mem = memory0 * (1.0 + 0.001 * i.astype(memory0.dtype))
            return jnp.asarray(fn(mem, tgt, perms, key), jnp.float32).sum()
        return slope_ms(body, key_impl='unsafe_rbg')

    return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=96)
    args = ap.parse_args()
    bs = args.bs
    dtype = jnp.bfloat16

    cfg = parseq.PARSeqConfig(num_tokens=97)
    params = jax.device_put(parseq.init(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)

    L = cfg.max_label_length + 2  # 27 tokens incl. BOS/EOS
    mem_len = (cfg.img_size[0] // cfg.vit.patch_size[0]) * (
        cfg.img_size[1] // cfg.vit.patch_size[1])
    D = cfg.embed_dim
    K = 6

    def batch(seed):
        k = jax.random.key(seed)
        memory = jax.random.normal(k, (bs, mem_len, D), dtype)
        tgt = jnp.asarray(rng.integers(0, 90, (bs, L)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(rng, cfg))[:K]
        return memory, tgt, perms, jax.random.key(seed + 1)

    timed = make_timed(batch(0))

    # ---- production piece: decode(K perms) + head + masked CE --------------
    def loss_from_memory(memory, tgt_ids, perms, key, drop):
        tgt_in = tgt_ids[:, :-1]
        tgt_out = tgt_ids[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def decode_one(c, q, r):
            out = parseq.decode(params, cfg, tgt_in, memory, query_bias=q,
                                content_bias=c, padding_mask=padding_mask,
                                dtype=dtype, drop=drop, rng=r)
            return parseq.head(params, out)

        if drop == 0.0:
            logits = jax.vmap(decode_one, in_axes=(0, 0, None))(cb, qb, None)
        else:
            logits = jax.vmap(decode_one)(cb, qb, jax.random.split(key, K))
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    prod = jax.jit(lambda m, t, p, k: loss_from_memory(m, t, p, k, cfg.dropout))
    nodrop = jax.jit(lambda m, t, p, k: loss_from_memory(m, t, p, k, 0.0))

    # shared dropout masks across perms: rng unbatched under vmap, so each
    # dropout site draws ONE (B, L, D) mask reused by all K perms (expected
    # per-perm gradient unchanged; cross-perm mask correlation only).
    def loss_shared_mask(memory, tgt_ids, perms, key):
        tgt_in = tgt_ids[:, :-1]
        tgt_out = tgt_ids[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def decode_one(c, q, r):
            out = parseq.decode(params, cfg, tgt_in, memory, query_bias=q,
                                content_bias=c, padding_mask=padding_mask,
                                dtype=dtype, drop=cfg.dropout, rng=r)
            return parseq.head(params, out)

        logits = jax.vmap(decode_one, in_axes=(0, 0, None))(cb, qb, key)
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    t_prod = timed(prod)
    t_nodrop = timed(nodrop)
    t_shared = timed(loss_shared_mask)

    # ---- decode only (no head/loss), no dropout ----------------------------
    def decode_only(memory, tgt_ids, perms, key):
        tgt_in = tgt_ids[:, :-1]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def one(c, q):
            return parseq.decode(params, cfg, tgt_in, memory, query_bias=q,
                                 content_bias=c, padding_mask=padding_mask,
                                 dtype=dtype, drop=0.0, rng=None)

        return jax.vmap(one, in_axes=(0, 0))(cb, qb).sum()

    t_decode = timed(decode_only)

    # ---- sublayer ablations (no dropout): drop one piece at a time ---------
    def stream_ablate(memory, tgt_ids, perms, skip):
        """Re-implements the single two-stream layer query path with one
        sublayer removed; content stream never updates at dec_depth=1."""
        tgt_in = tgt_ids[:, :-1]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)
        content = parseq.embed_context(params, cfg, tgt_in, dtype)
        Lq = tgt_in.shape[1]
        query0 = jnp.broadcast_to(params['pos_queries'][:, :Lq].astype(dtype),
                                  (bs, Lq, D))
        lp = params['decoder']['layers'][0]
        nhead = cfg.dec_num_heads

        def one(c_bias, q_bias):
            q = query0
            qn = layer_norm(lp['norm_q'], q)
            cn = layer_norm(lp['norm_c'], content)
            if skip != 'self':
                q = q + mha(lp['self_attn'], qn, cn, cn, num_heads=nhead,
                            attn_bias=q_bias, key_padding_mask=padding_mask)
            if skip != 'cross':
                q = q + mha(lp['cross_attn'], layer_norm(lp['norm1'], q),
                            memory, memory, num_heads=nhead)
            if skip != 'mlp':
                h = layers.gelu(linear(lp['linear1'], layer_norm(lp['norm2'], q)))
                q = q + linear(lp['linear2'], h)
            return layer_norm(params['decoder']['norm'], q)

        return jax.vmap(one, in_axes=(0, 0))(cb, qb).sum()

    t_ab = {}
    for skip in ('none', 'self', 'cross', 'mlp'):
        t_ab[skip] = timed(lambda m, t, p, k, s=skip: stream_ablate(m, t, p, s))

    # ---- pure matmul floor: identical matmul shapes, zero glue -------------
    def matmul_floor(memory, tgt_ids, perms, key):
        lp = params['decoder']['layers'][0]
        # real data (a zeros input lets XLA's algebraic simplifier delete
        # the matmuls outright, making the "floor" fictional)
        rows = K * bs * (L - 1)
        flat = memory.reshape(-1, D)
        x = jnp.concatenate([flat] * (rows // flat.shape[0] + 1), 0)[:rows]
        h = x
        for p in (lp['self_attn']['q'], lp['self_attn']['k'],
                  lp['self_attn']['v'], lp['self_attn']['out'],
                  lp['cross_attn']['q'], lp['cross_attn']['out']):
            h = h + linear(p, x)
        # cross K/V over memory (perm-independent, computed once)
        mk = linear(lp['cross_attn']['k'], memory.reshape(-1, D))
        mv = linear(lp['cross_attn']['v'], memory.reshape(-1, D))
        # MLP + head
        hh = linear(lp['linear1'], x)
        h2 = linear(lp['linear2'], hh)
        lg = linear(params['head'], x)
        return h.sum() + mk.sum() + mv.sum() + h2.sum() + lg.sum()

    t_floor = timed(matmul_floor)

    # ---- perm-fold layout: (K*B, L, D) batch, no vmap ----------------------
    def folded(memory, tgt_ids, perms, key):
        tgt_in = tgt_ids[:, :-1]
        tgt_out = tgt_ids[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)  # (K, L-1, L-1)
        Lq = tgt_in.shape[1]
        mem_f = jnp.broadcast_to(memory[None], (K, bs, mem_len, D)).reshape(
            K * bs, mem_len, D)
        tgt_f = jnp.broadcast_to(tgt_in[None], (K, bs, Lq)).reshape(K * bs, Lq)
        pm_f = jnp.broadcast_to(padding_mask[None], (K, bs, Lq)).reshape(K * bs, Lq)
        qb_f = jnp.repeat(qb, bs, axis=0)[:, None]  # (K*B, 1, L-1, L-1)
        cb_f = jnp.repeat(cb, bs, axis=0)[:, None]
        out = parseq.decode(params, cfg, tgt_f, mem_f, query_bias=qb_f,
                            content_bias=cb_f, padding_mask=pm_f,
                            dtype=dtype, drop=0.0, rng=None)
        logits = parseq.head(params, out).reshape(K, bs, Lq, -1)
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    fold_j = jax.jit(folded)
    t_fold = timed(folded)
    # numerical check vs the vmap path
    b0 = batch(0)
    a = float(nodrop(*b0))
    b = float(fold_j(*b0))

    # ---- perm-fold WITH per-perm-independent dropout ------------------------
    # One decode over a (K*B) batch with a single rng key: every dropout site
    # draws one (K*B, ...) mask in ONE RngBitGenerator call, so masks stay
    # independent across perms (reference semantics, system.py:181-186) while
    # the K separate RNG ops + fusion barriers of the vmap path disappear.
    def folded_drop(memory, tgt_ids, perms, key):
        tgt_in = tgt_ids[:, :-1]
        tgt_out = tgt_ids[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)  # (K, L-1, L-1)
        Lq = tgt_in.shape[1]
        mem_f = jnp.broadcast_to(memory[None], (K, bs, mem_len, D)).reshape(
            K * bs, mem_len, D)
        tgt_f = jnp.broadcast_to(tgt_in[None], (K, bs, Lq)).reshape(K * bs, Lq)
        pm_f = jnp.broadcast_to(padding_mask[None], (K, bs, Lq)).reshape(K * bs, Lq)
        qb_f = jnp.repeat(qb, bs, axis=0)[:, None]
        cb_f = jnp.repeat(cb, bs, axis=0)[:, None]
        out = parseq.decode(params, cfg, tgt_f, mem_f, query_bias=qb_f,
                            content_bias=cb_f, padding_mask=pm_f,
                            dtype=dtype, drop=cfg.dropout, rng=key)
        logits = parseq.head(params, out).reshape(K, bs, Lq, -1)
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    t_folddrop = timed(folded_drop)

    # ---- uint8 dropout bits: per-perm independent masks, half the RNG volume
    # Threshold compare on uint8 bits; drop prob quantized to thr/256 and the
    # inverse scale uses the QUANTIZED keep rate, so inverted dropout stays
    # exactly unbiased (rate 0.1 -> effective 0.1016).
    def dropout_u8(x, rate, rng=None):
        if rng is None or rate == 0.0:
            return x
        thr = min(int(round(rate * 256.0)), 255)
        keep_q = 1.0 - thr / 256.0
        bits = jax.random.bits(rng, x.shape, jnp.uint8)
        return jnp.where(bits >= thr, x / keep_q, 0).astype(x.dtype)

    orig = layers.dropout
    import parseq_tpu.models.parseq as parseq_mod
    layers.dropout = dropout_u8
    parseq_mod.dropout = dropout_u8
    try:
        t_u8 = timed(lambda m, t, p, k: loss_from_memory(m, t, p, k, cfg.dropout))
    finally:
        layers.dropout = orig
        parseq_mod.dropout = orig

    # ---- bulk-bits dropout: one RngBitGenerator per site for all K perms
    import dataclasses
    cfg_bulk = dataclasses.replace(cfg, bulk_dropout_bits=True)

    def loss_bulk(memory, tgt_ids, perms, key):
        # multi_perm_loss minus the encoder: replicate its bulk-bits branch
        tgt_in = tgt_ids[:, :-1]
        tgt_out = tgt_ids[:, 1:]
        padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)
        cb, qb = jax.vmap(parseq.perm_attn_masks)(perms)

        def decode_one(c, q, r):
            out = parseq.decode(params, cfg_bulk, tgt_in, memory, query_bias=q,
                                content_bias=c, padding_mask=padding_mask,
                                dtype=dtype, drop=cfg.dropout, rng=r)
            return parseq.head(params, out)

        B_, Lq = tgt_in.shape
        shapes = parseq.dropout_site_shapes(cfg_bulk, B_, Lq, memory.shape[1])
        site_keys = list(jax.random.split(key, len(shapes)))
        bits = [jax.random.bits(kk, (K, *s), jnp.uint16)
                for kk, s in zip(site_keys, shapes)]
        logits = jax.vmap(decode_one)(cb, qb, bits)
        base_valid = tgt_out != cfg.pad_id
        eos_pos = tgt_out == cfg.eos_id
        k_idx = jnp.arange(K)[:, None, None]
        valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
        nll = -jnp.take_along_axis(
            logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    t_bulk = timed(loss_bulk)

    print(f'bs={bs} K={K} L={L} (decoder+head+loss piece, memory precomputed)')
    print(f'  production (dropout on) : {t_prod:6.2f} ms')
    print(f'  bulk-bits dropout       : {t_bulk:6.2f} ms')
    print(f'  shared masks across K   : {t_shared:6.2f} ms')
    print(f'  no dropout              : {t_nodrop:6.2f} ms')
    print(f'  decode only (no head/CE): {t_decode:6.2f} ms')
    print(f'  ablations (no dropout, decode-only):')
    print(f'    full        : {t_ab["none"]:6.2f} ms')
    print(f'    - self-attn : {t_ab["self"]:6.2f} ms  (self cost ~{t_ab["none"]-t_ab["self"]:.2f})')
    print(f'    - cross-attn: {t_ab["cross"]:6.2f} ms  (cross cost ~{t_ab["none"]-t_ab["cross"]:.2f})')
    print(f'    - MLP       : {t_ab["mlp"]:6.2f} ms  (mlp cost ~{t_ab["none"]-t_ab["mlp"]:.2f})')
    print(f'  pure matmul floor       : {t_floor:6.2f} ms')
    print(f'  perm-folded (K*B batch) : {t_fold:6.2f} ms   loss {b:.4f} vs vmap {a:.4f}')
    print(f'  perm-folded + indep drop: {t_folddrop:6.2f} ms')
    print(f'  uint8 dropout bits      : {t_u8:6.2f} ms')


if __name__ == '__main__':
    main()
