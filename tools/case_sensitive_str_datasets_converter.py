#!/usr/bin/env python3
"""Convert case-sensitive STR dataset layouts to an LMDB packing list.

These datasets (released with case-sensitive STR evaluations) use a flat
layout: images at ``IMG/<n>.<ext>`` and one-line label files at
``label/<n>.txt``, numbered 1..N with a single extension (jpg or png) per
dataset. The converter pairs each image with the first line of its label
file (behavior parity with reference
tools/case_sensitive_str_datasets_converter.py).

Usage: python tools/case_sensitive_str_datasets_converter.py ROOT [--out NAME]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _gt_common import write_gt_list  # noqa: E402


def detect_extension(root: Path) -> str:
    return 'jpg' if (root / 'IMG' / '1.jpg').is_file() else 'png'


def paired_records(root: Path):
    """Yield (IMG/<n>.<ext>, label) over the numbered label files."""
    ext = detect_extension(root)
    count = sum(1 for _ in (root / 'label').glob('*.txt'))
    for n in range(1, count + 1):
        label = (root / 'label' / f'{n}.txt').read_text().splitlines()
        yield f'IMG/{n}.{ext}', (label[0].strip() if label else '')


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('root', type=Path, help='dataset dir containing IMG/ and label/')
    ap.add_argument('--out', default='lmdb.txt', help='output list file name')
    args = ap.parse_args(argv)

    n = write_gt_list(args.root / args.out, paired_records(args.root),
                      encoding='utf-8')
    print(f'{args.root / args.out}: {n} records')


if __name__ == '__main__':
    main()
