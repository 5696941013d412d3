#!/usr/bin/env python3
"""Measure ABINet language-model word accuracy given ground truth as input
(reference tools/test_abinet_lm_acc.py:22-111).

Feeds one-hot ground-truth labels into the BCN language model alone and
reports how often it reproduces the word — isolates the LM from the vision
model.

Usage:
    python tools/test_abinet_lm_acc.py CHECKPOINT --data_root data [--split test/IIIT5k ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parseq_tpu.data.dataset import LmdbDataset  # noqa: E402
from parseq_tpu.models import abinet  # noqa: E402
from parseq_tpu.utils.registry import load_from_checkpoint  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('checkpoint')
    ap.add_argument('--data_root', default='data')
    ap.add_argument('--splits', nargs='+',
                    default=['test/IIIT5k', 'test/SVT', 'test/SVTP', 'test/IC13_1015',
                             'test/IC15_2077', 'test/CUTE80'])
    ap.add_argument('--batch_size', type=int, default=256)
    args = ap.parse_args(argv)

    model = load_from_checkpoint(args.checkpoint)
    cfg: abinet.ABINetConfig = model.cfg
    tok = model.tokenizer
    # ABINet bundles carry BatchNorm stats: {'params', 'stats'}; the LM is
    # transformer-only, so only the param tree is needed.
    tree = model.params
    params = tree['params'] if isinstance(tree, dict) and 'stats' in tree else tree

    @jax.jit
    def lm_forward(params, inputs, lengths):
        return abinet.language_forward(params['language'], cfg, inputs, lengths)['logits']

    total = correct = 0
    for split in args.splits:
        ds = LmdbDataset(os.path.join(args.data_root, split),
                         model.raw_config['charset_train'], cfg.max_label_length)
        labels = ds.labels
        for i in range(0, len(labels), args.batch_size):
            batch = labels[i : i + args.batch_size]
            enc = tok.encode(batch, cfg.max_label_length)[:, 1:]  # drop BOS
            enc = enc[:, : cfg.max_length]
            targets = np.where(enc == cfg.pad_id, cfg.null_label, enc)
            onehot = jax.nn.one_hot(jnp.asarray(targets), cfg.num_classes)
            lengths = jnp.asarray([len(l) + 1 for l in batch], jnp.int32)
            logits = lm_forward(params, onehot, lengths)
            probs = jax.nn.softmax(logits, -1)
            preds, _ = tok.decode(np.asarray(probs))
            for pred, gt in zip(preds, batch):
                correct += model.charset_adapter(pred) == gt
                total += 1
        print(f'{split}: running accuracy {100 * correct / max(total, 1):.2f}%')
    print(f'LM word accuracy: {100 * correct / max(total, 1):.2f}% ({correct}/{total})')


if __name__ == '__main__':
    main()
