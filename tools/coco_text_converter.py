#!/usr/bin/env python3
"""Convert COCO-Text v1.4 word ground truth to LMDB packing lists.

COCO-Text v1.4 ships per-split files ``{split}_words_gt.txt`` with
``filename,transcription`` lines (the transcription may contain commas, so
only the first comma delimits); images live under ``{split}_words/`` as
``<filename>.jpg``. Lines without a comma are metadata/blank lines and are
skipped; transcriptions are whitespace-stripped and stripped of the ``|``
markers the annotations wrap some words in (behavior parity with reference
tools/coco_text_converter.py).

Usage: python tools/coco_text_converter.py [ROOT] [--splits train val]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _gt_common import read_text_lines, write_gt_list  # noqa: E402


def word_records(lines, image_dir):
    """Yield (image path, cleaned transcription) from one split's gt lines."""
    for line in lines:
        head, sep, transcription = line.partition(',')
        if not sep:
            continue  # malformed/blank line
        yield f'{image_dir}/{head.strip()}.jpg', transcription.strip().strip('|')


def convert_split(root: Path, split: str) -> int:
    lines = read_text_lines(root / f'{split}_words_gt.txt')
    return write_gt_list(root / f'{split}_lmdb.txt',
                         word_records(lines, f'{split}_words'))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('root', type=Path, nargs='?', default=Path('.'),
                    help='directory with {split}_words_gt.txt files')
    ap.add_argument('--splits', nargs='+', default=['train', 'val'])
    args = ap.parse_args(argv)

    for split in args.splits:
        n = convert_split(args.root, split)
        print(f'{split}: {n} records')


if __name__ == '__main__':
    main()
