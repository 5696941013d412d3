#!/usr/bin/env python3
"""Filter an LMDB dataset by minimum image dimension, re-indexing the output
(reference tools/filter_lmdb.py).

Usage:
    python tools/filter_lmdb.py INPUT... --output OUT [--min_image_dim 8]
"""

import argparse
import io
import os
import sys

from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from parseq_tpu.data.lmdb import LmdbReader, LmdbWriter  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('inputs', nargs='+')
    ap.add_argument('--output', required=True)
    ap.add_argument('--min_image_dim', type=int, default=8)
    args = ap.parse_args()

    os.makedirs(args.output, exist_ok=True)
    out_cnt = 0
    with LmdbWriter(args.output) as w:
        for inp in args.inputs:
            with LmdbReader(inp) as rd:
                n = int(rd.get(b'num-samples'))
                filtered = 0
                for i in range(1, n + 1):
                    img_bin = rd.get(f'image-{i:09d}'.encode())
                    label = rd.get(f'label-{i:09d}'.encode())
                    wh = Image.open(io.BytesIO(img_bin)).size
                    if min(wh) < args.min_image_dim:
                        filtered += 1
                        continue
                    out_cnt += 1
                    w.put(f'image-{out_cnt:09d}'.encode(), img_bin)
                    w.put(f'label-{out_cnt:09d}'.encode(), label)
                print(f'{inp}: filtered {filtered} of {n}')
        w.put(b'num-samples', str(out_cnt).encode())
    print(f'Wrote {out_cnt} samples to {args.output}')


if __name__ == '__main__':
    main()
