"""Learning-rate search (reference tune.py equivalent, no Ray/Ax).

Replaces Ray Tune + AxSearch + MedianStoppingRule (tune.py:133-199) with
synchronous successive halving (ASHA-style): sample log-spaced LRs seeded
like the reference's AxSearch grid, train each candidate for a rung of
steps, keep the best half by val_NED, double the rung, repeat. Runs trials
sequentially on the local mesh (one TPU chip or CPU devices).

Usage:
    python -m parseq_tpu.cli.tune [+experiment=parseq-tiny] [key=value ...]
        [--num_samples 8] [--rung_steps 500] [--lr_min 1e-4] [--lr_max 2e-3]
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

from parseq_tpu.utils.config import compose, parse_cli_overrides

log = logging.getLogger(__name__)


def lr_grid(lo, hi, n):
    """Log-spaced seed points (reference tune.py:157-163)."""
    return list(np.exp(np.linspace(np.log(lo), np.log(hi), n)))


def run_trial(config, lr, steps, work_dir, seed=0):
    import copy

    cfg = copy.deepcopy(config)
    cfg['model']['lr'] = float(lr)
    from parseq_tpu.train.loop import train

    state, best = train(cfg, work_dir, max_steps=steps, seed=seed)
    # read the last val metrics from the jsonl log
    metrics = [json.loads(l) for l in open(Path(work_dir) / 'metrics.jsonl')]
    vals = [m for m in metrics if 'val_NED' in m]
    if not vals:
        return {'lr': lr, 'val_NED': 0.0, 'val_accuracy': 0.0, 'val_loss': float('inf')}
    last = vals[-1]
    return {'lr': lr, 'val_NED': last['val_NED'], 'val_accuracy': last['val_accuracy'],
            'val_loss': last['val_loss']}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('overrides', nargs='*')
    ap.add_argument('--experiment', default=None)
    ap.add_argument('--num_samples', type=int, default=8)
    ap.add_argument('--rung_steps', type=int, default=500)
    ap.add_argument('--rungs', type=int, default=3)
    ap.add_argument('--lr_min', type=float, default=1e-4)
    ap.add_argument('--lr_max', type=float, default=2e-3)
    ap.add_argument('--work_dir', default=None)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    tokens, experiment = [], args.experiment
    for tok in args.overrides:
        if tok.startswith('+experiment='):
            experiment = tok.split('=', 1)[1]
        else:
            tokens.append(tok)
    config = compose(experiment, overrides=parse_cli_overrides(tokens))
    # validate frequently enough that every rung reports
    config['trainer']['val_check_interval'] = min(
        config['trainer'].get('val_check_interval', 1000), args.rung_steps)

    root = Path(args.work_dir or f'ray_results/{config["model"].get("name", "model")}/'
                                 f'{time.strftime("%Y-%m-%d_%H-%M-%S")}')
    root.mkdir(parents=True, exist_ok=True)

    candidates = lr_grid(args.lr_min, args.lr_max, args.num_samples)
    steps = args.rung_steps
    results = []
    for rung in range(args.rungs):
        scored = []
        for i, lr in enumerate(candidates):
            tdir = root / f'rung{rung}_trial{i}_lr{lr:.2e}'
            log.info(f'rung {rung}: trial lr={lr:.3e} for {steps} steps')
            res = run_trial(config, lr, steps, tdir)
            log.info(f'  -> val_NED={res["val_NED"]:.3f} acc={res["val_accuracy"]:.3f}')
            scored.append(res)
            results.append({'rung': rung, 'steps': steps, **res})
        scored.sort(key=lambda r: r['val_NED'], reverse=True)
        keep = max(1, len(scored) // 2)
        candidates = [r['lr'] for r in scored[:keep]]
        steps *= 2
        if len(candidates) == 1:
            break

    best = max(results, key=lambda r: (r['rung'], r['val_NED']))
    (root / 'results.json').write_text(json.dumps(results, indent=2))
    print(json.dumps({'best_lr': best['lr'], 'val_NED': best['val_NED'],
                      'val_accuracy': best['val_accuracy']}))


if __name__ == '__main__':
    main()
