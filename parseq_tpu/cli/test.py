"""Benchmark-suite evaluation (reference test.py equivalent).

Usage:
    python -m parseq_tpu.cli.test <checkpoint> [--data_root data]
        [--cased] [--punctuation] [--new] [--rotation N]
        [model_override:type=value ...]
"""

from __future__ import annotations

import argparse
import string
import sys

from parseq_tpu.data import module as data_module
from parseq_tpu.train.evaluate import eval_dataset, print_results_table
from parseq_tpu.utils.config import parse_model_args
from parseq_tpu.utils.registry import load_from_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('checkpoint')
    ap.add_argument('--data_root', default='data')
    ap.add_argument('--batch_size', type=int, default=512)
    ap.add_argument('--num_workers', type=int, default=4)
    ap.add_argument('--cased', action='store_true')
    ap.add_argument('--punctuation', action='store_true')
    ap.add_argument('--new', action='store_true', help='Include new benchmark datasets')
    ap.add_argument('--rotation', type=int, default=0)
    ap.add_argument('--int8', action='store_true',
                    help='int8 encoder serving path (ViT-backed models)')
    args, unknown = ap.parse_known_args(argv)
    kwargs = parse_model_args(unknown)

    import os

    if (os.cpu_count() or 1) <= 1 and args.num_workers > 0:
        # On a single-core host the decode pool adds IPC cost with zero
        # parallelism (and forking after JAX init is fragile); run inline.
        print('single-core host: running decode inline (num_workers=0)',
              file=sys.stderr)
        args.num_workers = 0

    charset_test = string.digits + string.ascii_lowercase
    if args.cased:
        charset_test += string.ascii_uppercase
    if args.punctuation:
        charset_test += string.punctuation
    kwargs['charset_test'] = charset_test
    print(f'Additional keyword arguments: {kwargs}')

    model = load_from_checkpoint(args.checkpoint, **kwargs)
    if args.int8:
        from parseq_tpu.ops.quant import quantize_bundle

        model = quantize_bundle(model)
    dm = data_module.SceneTextDataModule(
        args.data_root, '_unused_', model.img_size,
        model.raw_config.get('max_label_length', 25),
        model.raw_config['charset_train'], charset_test,
        args.batch_size, args.num_workers, augment=False, rotation=args.rotation,
    )

    test_set = data_module.TEST_BENCHMARK_SUB + data_module.TEST_BENCHMARK
    if args.new:
        test_set += data_module.TEST_NEW
    test_set = sorted(set(test_set))

    results = {}
    for name, loader in dm.test_dataloaders(test_set).items():
        print(f'Evaluating {name}...', file=sys.stderr)
        results[name] = eval_dataset(model, loader, name)

    result_groups = {
        'Benchmark (Subset)': data_module.TEST_BENCHMARK_SUB,
        'Benchmark': data_module.TEST_BENCHMARK,
    }
    if args.new:
        result_groups['New'] = data_module.TEST_NEW
    with open(args.checkpoint + '.log.txt', 'w') as f:
        for out in (f, sys.stdout):
            for group, subset in result_groups.items():
                print(f'{group} set:', file=out)
                print_results_table([results[s] for s in subset], out)
                print('\n', file=out)


if __name__ == '__main__':
    main()
