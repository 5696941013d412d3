#!/usr/bin/env python
"""Int8-encoder accuracy vs bf16 at released PARSeq-S geometry.

Same protocol as experiments/fused_ar_fullsize.py (train a PARSeq-S-shaped
model from scratch on the real chip on synthetic rendered words, then
compare decode paths on held-out renderings) — here the compared paths are
the bf16 production forward vs the same forward with the encoder's eight
per-block matmuls quantized to int8 (ops/quant.py: per-channel weights,
dynamic per-token activations). Gate for promoting int8 serving: val word
accuracy within noise of bf16 and high string agreement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np

import jax
import jax.numpy as jnp

from experiments.convergence_tpu import make_data, H, W
from parseq_tpu.data import Tokenizer
from parseq_tpu.models import parseq
from parseq_tpu.ops import quant
from parseq_tpu.train import optim
from parseq_tpu.train.evaluate import score_batch
from parseq_tpu.utils.registry import CharsetAdapter


def main(steps=1500, bs=128):
    import string

    rng = np.random.default_rng(0)
    charset = string.digits + string.ascii_lowercase + string.ascii_uppercase + string.punctuation
    cfg = parseq.PARSeqConfig(
        num_tokens=len(charset) + 3, max_label_length=25, img_size=(H, W),
        patch_size=(4, 8), embed_dim=384, enc_num_heads=6, enc_depth=12,
        dec_num_heads=12, dec_depth=1, decode_ar=True, refine_iters=1,
    )
    tok = Tokenizer(charset)
    adapter = CharsetAdapter(charset)

    train_imgs, train_words, vocab = make_data(4096, rng)
    val_imgs, val_words, _ = make_data(512, rng, vocab)
    ocfg = optim.OptimConfig(lr=7e-4, batch_size=bs, total_steps=steps,
                             warmup_pct=0.1, swa=False)
    params = parseq.init(jax.random.key(0), cfg)
    tx, _ = optim.make_optimizer(ocfg, params)
    state = {'params': params, 'stats': {}, 'opt_state': tx.init(params),
             'step': jnp.zeros((), jnp.int32)}
    from parseq_tpu.train.steps import make_parseq_train_step

    step_fn = jax.jit(make_parseq_train_step(cfg, tx), donate_argnums=(0,))
    base_rng = jax.random.key(1)

    t0 = time.time()
    for s in range(1, steps + 1):
        idx = rng.integers(0, len(train_words), bs)
        tgt = tok.encode([train_words[i] for i in idx], cfg.max_label_length)
        perms = parseq.gen_tgt_perms(rng, cfg)
        state, m = step_fn(state, jnp.asarray(train_imgs[idx]), jnp.asarray(tgt),
                           jnp.asarray(perms), base_rng)
        if s % 250 == 0 or s == steps:
            print(f'step {s:4d}: loss={float(m["loss"]):.3f} ({time.time()-t0:.0f}s)',
                  flush=True)
    params = jax.device_get(state['params'])
    qparams = dict(params, encoder=quant.quantize_vit_encoder(params['encoder']))

    fwd = jax.jit(lambda p, x: parseq.forward(p, cfg, x, dtype=jnp.bfloat16))

    def run_eval(pp):
        correct = total = 0
        all_strings = []
        for i in range(0, len(val_words), bs):
            im = val_imgs[i:i + bs]
            labels = val_words[i:i + bs]
            if len(im) < bs:
                im = np.concatenate([im, np.zeros((bs - len(im), H, W, 3), np.float32)])
            logits = jax.device_get(fwd(pp, jnp.asarray(im)))
            probs = jax.device_get(jax.nn.softmax(jnp.asarray(logits), -1))
            r = score_batch(tok, adapter, probs, labels,
                            valid=np.arange(bs) < len(labels))
            preds, _ = tok.decode(probs)
            all_strings.extend(preds[: len(labels)])
            correct += r.correct
            total += r.num_samples
        return 100.0 * correct / total, all_strings

    results = {}
    strings = {}
    for name, pp in (('bf16', params), ('int8_encoder', qparams)):
        acc, s = run_eval(pp)
        results[f'{name}_val_acc'] = round(acc, 2)
        strings[name] = s
        print(f'{name}: val_acc={acc:.2f}%', flush=True)
    agree = float(np.mean([x == y for x, y in zip(strings['bf16'],
                                                  strings['int8_encoder'])]))
    results['string_agreement'] = round(agree, 4)
    print(f'string agreement bf16 vs int8: {agree:.4f}', flush=True)
    print(json.dumps(results))
    return results


if __name__ == '__main__':
    main()
