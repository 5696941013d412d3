#!/usr/bin/env python3
"""Convert ArT (Arbitrary-shaped Text) task-2 labels to a gt list.

ArT's ``train_task2_labels.json`` maps each image key to a single-element
list of annotations ``{language, illegibility, transcription, ...}``; crops
live at ``train_task2_images/<key>.jpg``. Kept records are legible Latin
transcriptions; annotators mark corrupted text with ``#``, so labels
containing ``#`` are dropped — except the literal string ``LocaL#3``, a
real storefront name mislabeled by that convention (behavior parity with
reference tools/art_converter.py, including the warning on multi-annotation
entries).

Usage: python tools/art_converter.py [LABELS_JSON] [--out GT]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _gt_common import write_gt_list  # noqa: E402

CORRUPTION_MARK = '#'
CORRUPTION_WHITELIST = frozenset({'LocaL#3'})
IMAGE_DIR = 'train_task2_images'


def keep(annotation) -> str | None:
    """Return the cleaned transcription if the annotation is usable."""
    if annotation['language'].lower() != 'latin' or annotation['illegibility']:
        return None
    transcription = annotation['transcription'].strip()
    if not transcription:
        return None
    if CORRUPTION_MARK in transcription and transcription not in CORRUPTION_WHITELIST:
        return None
    return transcription


def art_records(labels: dict):
    for key, annotations in labels.items():
        if len(annotations) != 1:
            print('error', annotations)
        transcription = keep(annotations[0])
        if transcription is not None:
            yield f'{IMAGE_DIR}/{key}.jpg', transcription


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('labels', type=Path, nargs='?',
                    default=Path('train_task2_labels.json'))
    ap.add_argument('--out', type=Path, default=Path('gt.txt'))
    args = ap.parse_args(argv)

    with open(args.labels, encoding='utf8') as f:
        labels = json.load(f)
    n = write_gt_list(args.out, art_records(labels))
    print(f'{args.out}: {n} records')


if __name__ == '__main__':
    main()
