#!/usr/bin/env python3
"""COCO-Text v1.4 word gt files -> lmdb gt lists (reference
tools/coco_text_converter.py)."""
import sys

root = sys.argv[1] if len(sys.argv) > 1 else '.'

for s in ['train', 'val']:
    with open(f'{root}/{s}_words_gt.txt', encoding='utf8') as f:
        d = f.readlines()
    with open(f'{root}/{s}_lmdb.txt', 'w', encoding='utf8') as f:
        for line in d:
            try:
                fname, label = line.split(',', maxsplit=1)
            except ValueError:
                continue
            fname = f'{s}_words/{fname.strip()}.jpg'
            label = label.strip().strip('|')
            f.write('\t'.join([fname, label]) + '\n')
