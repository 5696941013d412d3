"""Training CLI (reference train.py equivalent).

Usage:
    python -m parseq_tpu.cli.train [+experiment=parseq-tiny] [key=value ...]

Overrides use dotted paths (model.lr=1e-3, trainer.devices=4, data.root_dir=...).
"""

from __future__ import annotations

import argparse
import logging
import time

from parseq_tpu.utils.config import compose, parse_cli_overrides


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('overrides', nargs='*', help='dotted config overrides key=value')
    ap.add_argument('--experiment', default=None)
    ap.add_argument('--charset', default=None)
    ap.add_argument('--dataset', default=None)
    ap.add_argument('--work_dir', default=None)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    # Multi-host SPMD (trainer.multihost=true): initialize the JAX
    # distributed runtime so jax.devices() spans all hosts of the slice.
    # Single-host (the common case, incl. this environment) skips this.
    tokens = []
    experiment = args.experiment
    for tok in args.overrides:
        if tok.startswith('+experiment='):
            experiment = tok.split('=', 1)[1]
        else:
            tokens.append(tok)
    config = compose(experiment, overrides=parse_cli_overrides(tokens),
                     charset=args.charset, dataset=args.dataset)
    name = config['model'].get('name', 'model')
    work_dir = args.work_dir or f'outputs/{name}/{time.strftime("%Y-%m-%d_%H-%M-%S")}'

    if config.get('trainer', {}).get('multihost'):
        import jax

        jax.distributed.initialize()

    from parseq_tpu.train.loop import train

    train(config, work_dir, seed=args.seed)


if __name__ == '__main__':
    main()
