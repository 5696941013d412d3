#!/usr/bin/env python3
"""LSVT -> cropped word images + label list (reference tools/lsvt_converter.py,
self-contained: json + multiprocessing instead of mmcv/mmocr).

Usage: python tools/lsvt_converter.py ROOT_PATH [N_PROC]
"""

import os
import os.path as osp
import re
import sys
from functools import partial

from PIL import Image

sys.path.insert(0, osp.dirname(__file__))
from _crop_common import crop_points, load_json, run_parallel, save_jpeg_like, write_lines  # noqa: E402

BLACKLIST = ['LOFTINESS*']
WHITELIST = ['#Find YOUR Fun#', 'Story #', '*0#']


def process_img(task, src_root, dst_root):
    img_idx, img_name, anns = task
    try:
        src_img = Image.open(osp.join(src_root, f'train_full_images_0/{img_name}.jpg'))
    except OSError:
        src_img = Image.open(osp.join(src_root, f'train_full_images_1/{img_name}.jpg'))
    labels = []
    for ann_idx, ann in enumerate(anns):
        text = ann['transcription']
        if (ann['illegibility'] or re.findall(r'[一-鿿]+', text)
                or text in BLACKLIST or ('#' in text and text not in WHITELIST)):
            continue
        dst_img = crop_points(src_img, ann['points'])
        name = f'img_{img_idx}_{ann_idx}.jpg'
        save_jpeg_like(dst_img, osp.join(dst_root, name), src_img)
        labels.append(f'{osp.basename(dst_root)}/{name} {text}')
    src_img.close()
    return labels


def main():
    root = sys.argv[1]
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    ann = load_json(osp.join(root, 'train_full_labels.json'))
    dst_root = osp.join(root, 'image_train')
    os.makedirs(dst_root, exist_ok=True)
    tasks = [(i, name, anns) for i, (name, anns) in enumerate(ann.items())]
    fn = partial(process_img, src_root=root, dst_root=dst_root)
    labels = [l for ls in run_parallel(fn, tasks, nproc) for l in ls]
    write_lines(osp.join(root, 'train_label.txt'), labels)
    print(f'Finish: {len(labels)} crops')


if __name__ == '__main__':
    main()
