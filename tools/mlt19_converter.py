#!/usr/bin/env python3
"""Convert MLT19 word-recognition ground truth to an LMDB packing list.

MLT19's recognition gt.txt is a CSV of ``image,script,transcription``
records, one word crop per line; transcriptions may themselves contain
commas, so only the first two commas delimit fields. The task here is
Latin scene text, so only the Latin and Symbols scripts are retained and
empty transcriptions are dropped (behavior parity with reference
tools/mlt19_converter.py).

Usage: python tools/mlt19_converter.py ROOT [--gt NAME] [--out NAME]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _gt_common import read_text_lines, write_gt_list  # noqa: E402

KEPT_SCRIPTS = frozenset({'Latin', 'Symbols'})


def latin_records(lines):
    """Yield (image, transcription) for Latin/Symbols records."""
    for line in lines:
        image, script, transcription = line.split(',', 2)
        transcription = transcription.strip()
        if transcription and script in KEPT_SCRIPTS:
            yield image, transcription


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('root', type=Path, help='directory containing the gt file')
    ap.add_argument('--gt', default='gt.txt', help='input gt file name')
    ap.add_argument('--out', default='lmdb.txt', help='output list file name')
    args = ap.parse_args(argv)

    n = write_gt_list(args.root / args.out,
                      latin_records(read_text_lines(args.root / args.gt)))
    print(f'{args.root / args.out}: {n} records')


if __name__ == '__main__':
    main()
