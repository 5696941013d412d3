#!/usr/bin/env python3
"""ArT -> gt.txt (reference tools/art_converter.py semantics: keep legible
Latin labels, drop corrupted '#' labels except the known-good 'LocaL#3')."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else 'train_task2_labels.json'
out = sys.argv[2] if len(sys.argv) > 2 else 'gt.txt'

with open(path, encoding='utf8') as f:
    d = json.load(f)

with open(out, 'w', encoding='utf8') as f:
    for k, v in d.items():
        if len(v) != 1:
            print('error', v)
        v = v[0]
        if v['language'].lower() != 'latin' or v['illegibility']:
            continue
        label = v['transcription'].strip()
        if not label or ('#' in label and label != 'LocaL#3'):
            continue
        f.write('\t'.join(['train_task2_images/' + k + '.jpg', label]) + '\n')
