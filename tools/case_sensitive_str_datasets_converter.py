#!/usr/bin/env python3
"""Case-sensitive STR dataset dirs (IMG/ + label/) -> lmdb.txt (reference
tools/case_sensitive_str_datasets_converter.py)."""
import os.path
import sys
from pathlib import Path

d = sys.argv[1]
p = Path(d)

num_samples = len(list(p.glob('label/*.txt')))
ext = 'jpg' if p.joinpath('IMG', '1.jpg').is_file() else 'png'

gt = []
for i in range(1, num_samples + 1):
    img = p.joinpath('IMG', f'{i}.{ext}')
    with open(p.joinpath('label', f'{i}.txt')) as f:
        label = f.readline()
    gt.append((os.path.join('IMG', img.name), label))

with open(d + '/lmdb.txt', 'w', encoding='utf-8') as f:
    for fname, label in gt:
        f.write('\t'.join([fname.strip(), label.strip()]) + '\n')
