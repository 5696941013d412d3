#!/usr/bin/env python
"""Full reference workflow at PARSeq-S scale on the real chip.

Exercises the complete user journey end to end with no shortcuts:

  1. pack synthetic word renderings into real LMDBs with our own writer
     (train/real + val + the six benchmark test dirs),
  2. `cli.train` — full PARSeq-S geometry, SPMD loop, OneCycle+SWA,
     validation, top-k checkpointing,
  3. `cli.test` — the benchmark-suite evaluation producing the reference's
     results tables (per-dataset + Combined, written to <ckpt>.log.txt),
  4. `cli.read` — single-image inference on files from disk.

The words are drawn from a fixed 64-word vocabulary; test images are unseen
renderings, so the Combined accuracy is a real (if easy) generalization
number. This is the strongest offline stand-in for the released-weights
Table-6 run: the identical command path, at the identical model scale, on
the real TPU.
"""

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
from PIL import Image

from experiments.convergence_tpu import CHARSET_36, H, W, render
from parseq_tpu.data.lmdb import LmdbWriter
from parseq_tpu.data.module import TEST_BENCHMARK, TEST_BENCHMARK_SUB


def png(img_float):
    arr = np.clip((img_float * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, 'PNG')
    return b.getvalue()


def write_db(path, samples):
    with LmdbWriter(path) as w:
        w.put(b'num-samples', str(len(samples)).encode())
        for i, (img, label) in enumerate(samples, start=1):
            w.put(f'image-{i:09d}'.encode(), img)
            w.put(f'label-{i:09d}'.encode(), label.encode())


def make_split(rng, vocab, n):
    out = []
    for _ in range(n):
        word = vocab[int(rng.integers(len(vocab)))]
        out.append((png(render(word, rng)), word))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/e2e_workflow')
    ap.add_argument('--steps', type=int, default=1500)
    ap.add_argument('--batch_size', type=int, default=128)
    ap.add_argument('--augment', action='store_true',
                    help='train with RandAugment on (covers the augment '
                         'pipeline incl. the LUT Poisson sampler)')
    ap.add_argument('--seed', type=int, default=0,
                    help='training seed (forwarded to cli.train) — seed '
                         'pairs at a fixed config pin run-to-run variance')
    ap.add_argument('--vocab_size', type=int, default=64,
                    help='distinct words in the synthetic task. The default '
                         '64 makes characters largely predictable from '
                         'teacher-forced context alone (a blind-LM basin '
                         'when augment crushes visual SNR — PERF.md round-5 '
                         'e2e section); a large vocab forces visual learning')
    ap.add_argument('--overrides', nargs='*', default=[],
                    help='extra dotted train-CLI overrides, e.g. '
                         'model.bulk_bits_uint8=true')
    args = ap.parse_args()
    root = args.root
    rng = np.random.default_rng(0)
    vocab = [''.join(rng.choice(list(CHARSET_36), int(rng.integers(2, 6))))
             for _ in range(args.vocab_size)]

    t0 = time.time()
    write_db(f'{root}/data/train/real/syn', make_split(rng, vocab, 6144))
    write_db(f'{root}/data/val/syn', make_split(rng, vocab, 512))
    for name in sorted(set(TEST_BENCHMARK + TEST_BENCHMARK_SUB)):
        write_db(f'{root}/data/test/{name}', make_split(rng, vocab, 128))
    demo_dir = f'{root}/demo'
    os.makedirs(demo_dir, exist_ok=True)
    demo_words = [vocab[i] for i in (0, 7, 21)]
    for i, wd in enumerate(demo_words):
        Image.open(io.BytesIO(png(render(wd, rng)))).save(f'{demo_dir}/img{i}.png')
    print(f'[{time.time()-t0:5.0f}s] LMDBs written (own writer)', flush=True)

    # ---- 2. train CLI: full PARSeq-S geometry ------------------------------
    from parseq_tpu.cli.train import main as train_main

    work = f'{root}/run'
    train_main(['--charset', '36_lowercase', '--work_dir', work,
                '--seed', str(args.seed),
                f'data.root_dir={root}/data', 'data.num_workers=0',
                f'data.augment={"true" if args.augment else "false"}',
                f'model.batch_size={args.batch_size}',
                f'trainer.max_steps={args.steps}',
                'trainer.val_check_interval=250', 'trainer.devices=1']
               + list(args.overrides))
    print(f'[{time.time()-t0:5.0f}s] training done', flush=True)

    # ---- 3. test CLI: benchmark tables -------------------------------------
    from parseq_tpu.cli.test import main as test_main

    ckpt = f'{work}/checkpoints/last.ckpt'
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        test_main([ckpt, '--data_root', f'{root}/data',
                   '--batch_size', '256', '--num_workers', '0'])
    table = buf.getvalue()
    print(table, flush=True)
    assert 'Combined' in table and os.path.exists(ckpt + '.log.txt')

    # ---- 4. read CLI: file inference ----------------------------------------
    from parseq_tpu.cli.read import main as read_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_main([ckpt, '--images'] + [f'{demo_dir}/img{i}.png' for i in range(3)])
    print(buf.getvalue(), flush=True)

    combined = [l for l in table.splitlines() if 'Combined' in l]
    print(json.dumps({'combined_rows': combined,
                      'expected_demo_words': demo_words,
                      'wall_s': round(time.time() - t0, 1)}))


if __name__ == '__main__':
    main()
