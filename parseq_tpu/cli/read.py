"""Read text from images (reference read.py equivalent).

Usage:
    python -m parseq_tpu.cli.read <checkpoint> --images img1.jpg img2.png
        [model_override:type=value ...]

`checkpoint` may be a native .ckpt, a reference PyTorch .pt, or
`pretrained=<experiment>` (resolved from the checksum cache; downloads when
the environment has network — see utils/pretrained.py).
"""

from __future__ import annotations

import argparse

import numpy as np

from parseq_tpu.data.transforms import batch_images
from parseq_tpu.utils.config import parse_model_args
from parseq_tpu.utils.registry import load_from_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('checkpoint', help="Native .ckpt, torch .pt, or 'pretrained=<experiment>'")
    ap.add_argument('--images', nargs='+', required=True, help='Image files to read')
    ap.add_argument('--int8', action='store_true',
                    help='int8 encoder serving path (ViT-backed models)')
    ap.add_argument('model_args', nargs='*', help='Model overrides key:type=value')
    args = ap.parse_args(argv)

    kwargs = parse_model_args(args.model_args)
    model = load_from_checkpoint(args.checkpoint, **kwargs)
    if args.int8:
        from parseq_tpu.ops.quant import quantize_bundle

        model = quantize_bundle(model)
    print(f'Additional model arguments: {kwargs}')

    images = batch_images(args.images, model.img_size)
    labels, confidence = model.read(images)
    for path, text, conf in zip(args.images, labels, confidence):
        print(f'{path}: {text} (conf={conf:.4f})')


if __name__ == '__main__':
    main()
