#!/usr/bin/env python
"""End-to-end learning demonstration on the real TPU chip.

Renders synthetic word images (PIL), trains a small PARSeq from scratch with
the full training stack (perm sampling, vmapped multi-perm loss, OneCycle,
bf16-mixed, remat), and reports validation word accuracy via the full
AR+refine inference path + tokenizer decode. Sanity bar: accuracy should go
from ~0% to >90% within a few hundred steps on this easy task.
"""

import io
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from PIL import Image, ImageDraw

import jax
import jax.numpy as jnp

from parseq_tpu.data import Tokenizer
from parseq_tpu.models import parseq
from parseq_tpu.train import optim
from parseq_tpu.train.evaluate import score_batch
from parseq_tpu.data.charset import CHARSET_36
from parseq_tpu.data.tokenizer import CTCTokenizer  # noqa: F401 (parity import)
from parseq_tpu.utils.registry import CharsetAdapter

H, W = 32, 128
MAXLEN = 8


def render(word, rng):
    img = Image.new('RGB', (W, H), tuple(rng.integers(200, 256, 3)))
    d = ImageDraw.Draw(img)
    x = int(rng.integers(2, 20))
    y = int(rng.integers(2, 12))
    d.text((x, y), word, fill=tuple(rng.integers(0, 80, 3)))
    return np.asarray(img, np.float32) / 127.5 - 1.0


def make_data(n, rng, vocab=None):
    # A fixed 64-word vocabulary: the model must learn real char recognition
    # (words appear at random positions/colors) but the task is achievable in
    # ~1k steps (val images are unseen renderings of seen words).
    if vocab is None:
        vocab = [''.join(rng.choice(list(CHARSET_36), int(rng.integers(2, 6))))
                 for _ in range(64)]
    words = []
    imgs = np.zeros((n, H, W, 3), np.float32)
    for i in range(n):
        w = vocab[int(rng.integers(len(vocab)))]
        words.append(w)
        imgs[i] = render(w, rng)
    return imgs, words, vocab


def main(steps=1200, bs=128, eval_every=200, shared_perm_dropout=True, seed=0,
         bulk_dropout_bits=False):
    rng = np.random.default_rng(seed)
    cfg = parseq.PARSeqConfig(
        num_tokens=len(CHARSET_36) + 3, max_label_length=MAXLEN,
        embed_dim=192, enc_num_heads=3, enc_depth=6, dec_num_heads=6,
        decode_ar=True, refine_iters=1, shared_perm_dropout=shared_perm_dropout,
        bulk_dropout_bits=bulk_dropout_bits,
    )
    tok = Tokenizer(CHARSET_36)
    adapter = CharsetAdapter(CHARSET_36)

    train_imgs, train_words, vocab = make_data(4096, rng)
    val_imgs, val_words, _ = make_data(256, rng, vocab)

    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=steps,
                             warmup_pct=0.1, swa=False)
    params = parseq.init(jax.random.key(seed), cfg)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}

    from parseq_tpu.train.steps import make_parseq_train_step

    step_fn = jax.jit(make_parseq_train_step(cfg, tx), donate_argnums=(0,))
    fwd = jax.jit(lambda p, im: parseq.forward(p, cfg, im, dtype=jnp.bfloat16))
    base_rng = jax.random.key(1)

    def evaluate(params):
        total_correct = total = 0
        for i in range(0, len(val_words), bs):
            im = val_imgs[i:i + bs]
            if len(im) < bs:
                im = np.concatenate([im, np.zeros((bs - len(im), H, W, 3), np.float32)])
            probs = jax.nn.softmax(fwd(params, jnp.asarray(im)), -1)
            r = score_batch(tok, adapter, jax.device_get(probs),
                            val_words[i:i + bs],
                            valid=np.arange(bs) < len(val_words[i:i + bs]))
            total_correct += r.correct
            total += r.num_samples
        return 100.0 * total_correct / total

    t0 = time.time()
    for s in range(1, steps + 1):
        idx = rng.integers(0, len(train_words), bs)
        tgt = tok.encode([train_words[i] for i in idx], MAXLEN)
        perms = parseq.gen_tgt_perms(rng, cfg)
        state, m = step_fn(state, jnp.asarray(train_imgs[idx]), jnp.asarray(tgt),
                           jnp.asarray(perms), base_rng)
        if s % eval_every == 0 or s == steps or s == 20:
            acc = evaluate(state['params'])
            print(f'step {s:4d}: loss={float(m["loss"]):.3f} val_acc={acc:.1f}% '
                  f'({time.time() - t0:.0f}s)', flush=True)
    return acc


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=1200)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--shared_perm_dropout', action='store_true')
    ap.add_argument('--bulk_dropout_bits', action='store_true')
    a = ap.parse_args()
    final = main(steps=a.steps, seed=a.seed,
                 shared_perm_dropout=a.shared_perm_dropout,
                 bulk_dropout_bits=a.bulk_dropout_bits)
    print(f'FINAL val word accuracy: {final:.1f}%')


def compare_decode_paths(steps=1000):
    """Train, then compare scan vs fused-kernel AR decode on the trained model:
    word accuracy and string agreement."""
    rng = np.random.default_rng(0)
    cfg = parseq.PARSeqConfig(
        num_tokens=len(CHARSET_36) + 3, max_label_length=MAXLEN,
        embed_dim=192, enc_num_heads=3, enc_depth=6, dec_num_heads=6,
        decode_ar=True, refine_iters=1,
    )
    tok = Tokenizer(CHARSET_36)
    adapter = CharsetAdapter(CHARSET_36)
    train_imgs, train_words, vocab = make_data(4096, rng)
    val_imgs, val_words, _ = make_data(256, rng, vocab)

    ocfg = optim.OptimConfig(lr=7e-4, batch_size=128, total_steps=steps,
                             warmup_pct=0.1, swa=False)
    params = parseq.init(jax.random.key(0), cfg)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    from parseq_tpu.train.steps import make_parseq_train_step

    step_fn = jax.jit(make_parseq_train_step(cfg, tx), donate_argnums=(0,))
    base_rng = jax.random.key(1)
    bs = 128
    for s in range(steps):
        idx = rng.integers(0, len(train_words), bs)
        tgt = tok.encode([train_words[i] for i in idx], MAXLEN)
        perms = parseq.gen_tgt_perms(rng, cfg)
        state, _ = step_fn(state, jnp.asarray(train_imgs[idx]), jnp.asarray(tgt),
                           jnp.asarray(perms), base_rng)

    results = {}
    preds_by_path = {}
    for name, fused in [('scan', False), ('fused', True)]:
        fwd = jax.jit(lambda p, im, f=fused: parseq.forward(
            p, cfg, im, dtype=jnp.bfloat16, use_fused_ar=f))
        correct = total = 0
        preds_all = []
        for i in range(0, len(val_words), bs):
            im = val_imgs[i:i + bs]
            pad = bs - len(im)
            if pad:
                im = np.concatenate([im, np.zeros((pad, H, W, 3), np.float32)])
            probs = jax.nn.softmax(fwd(state['params'], jnp.asarray(im)), -1)
            preds, _ = tok.decode(jax.device_get(probs))
            for j, gt in enumerate(val_words[i:i + bs]):
                pred = adapter(preds[j])
                preds_all.append(pred)
                correct += pred == gt
                total += 1
        results[name] = 100.0 * correct / total
        preds_by_path[name] = preds_all
    agree = np.mean([a == b for a, b in zip(preds_by_path['scan'], preds_by_path['fused'])])
    print(f'scan  val acc: {results["scan"]:.2f}%')
    print(f'fused val acc: {results["fused"]:.2f}%')
    print(f'string agreement: {100 * agree:.2f}%')
