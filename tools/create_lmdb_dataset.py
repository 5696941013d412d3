#!/usr/bin/env python3
"""Create an LMDB dataset from a gt file (reference tools/create_lmdb_dataset.py).

gt file format: one `<image_path> <label>` pair per line (path relative to
--input_path). Writes the standard schema: image-%09d / label-%09d /
num-samples, using our native LMDB writer (no liblmdb needed).

Usage:
    python tools/create_lmdb_dataset.py INPUT_PATH GT_FILE OUTPUT_PATH [--no-check]
"""

import argparse
import io
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from parseq_tpu.data.lmdb import LmdbWriter  # noqa: E402


def check_image(image_bin):
    try:
        img = Image.open(io.BytesIO(image_bin)).convert('RGB')
    except OSError:
        return False
    return int(np.prod(img.size)) > 0


def create_dataset(input_path, gt_file, output_path, check_valid=True):
    with open(gt_file, encoding='utf-8') as f:
        lines = f.readlines()

    os.makedirs(output_path, exist_ok=True)
    cnt = 1
    with LmdbWriter(output_path) as w:
        for i, line in enumerate(lines):
            image_path, label = line.strip().split(maxsplit=1)
            image_path = os.path.join(input_path, image_path)
            with open(image_path, 'rb') as f:
                image_bin = f.read()
            if check_valid and not check_image(image_bin):
                print(f'{image_path} is not a valid image', file=sys.stderr)
                continue
            w.put(f'image-{cnt:09d}'.encode(), image_bin)
            w.put(f'label-{cnt:09d}'.encode(), label.encode())
            if cnt % 1000 == 0:
                print(f'Collected {cnt} / {len(lines)}')
            cnt += 1
        n = cnt - 1
        w.put(b'num-samples', str(n).encode())
    print(f'Created dataset with {n} samples')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('input_path')
    ap.add_argument('gt_file')
    ap.add_argument('output_path')
    ap.add_argument('--no-check', action='store_true')
    a = ap.parse_args()
    create_dataset(a.input_path, a.gt_file, a.output_path, not a.no_check)


if __name__ == '__main__':
    main()
