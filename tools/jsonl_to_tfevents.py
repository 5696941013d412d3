#!/usr/bin/env python3
"""Convert a metrics.jsonl training log into a TensorBoard event file.

Training runs write both formats already; this backfills tfevents for logs
produced before the writer existed (or for externally generated JSONL).

Usage:
    python tools/jsonl_to_tfevents.py <metrics.jsonl> [--out <logdir>]
"""

import argparse
import json
from pathlib import Path

from parseq_tpu.utils.tbevents import TBEventWriter, read_events


def convert(jsonl_path: Path, out_dir: Path) -> Path:
    writer = TBEventWriter(out_dir)
    n = 0
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            step = rec.pop('step', None)
            if step is None:
                continue
            scalars = {k: v for k, v in rec.items()
                       if isinstance(v, (int, float)) and not isinstance(v, bool)}
            writer.add_scalars(step, scalars)
            n += 1
    writer.close()
    print(f'wrote {n} events to {writer.path}')
    return writer.path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('jsonl', type=Path)
    ap.add_argument('--out', type=Path, default=None,
                    help='output logdir (default: <jsonl dir>/tb)')
    ap.add_argument('--check', action='store_true',
                    help='re-parse the written file and print a summary')
    args = ap.parse_args(argv)
    out = args.out or args.jsonl.parent / 'tb'
    path = convert(args.jsonl, out)
    if args.check:
        events = read_events(path)
        tags = sorted({t for _, s in events for t in s})
        print(f'check: {len(events)} scalar events, tags={tags}')


if __name__ == '__main__':
    main()
