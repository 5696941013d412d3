#!/usr/bin/env python3
"""COCO-Text v2 -> cropped word images + label lists (reference
tools/coco_2_converter.py, self-contained).

Usage: python tools/coco_2_converter.py ROOT_PATH [N_PROC]
"""

import html
import os
import os.path as osp
import sys
from functools import partial

from PIL import Image

sys.path.insert(0, osp.dirname(__file__))
from _crop_common import crop_bbox, load_json, run_parallel, save_jpeg_like, write_lines  # noqa: E402


def process_img(task, src_root, dst_root):
    img_idx, img_info, anns = task
    src_img = Image.open(osp.join(src_root, 'train2014', img_info['file_name']))
    labels = []
    for ann_idx, ann in enumerate(anns):
        text = html.unescape(ann['utf8_string'].strip())
        if (not text or ann['class'] != 'machine printed'
                or ann['language'] != 'english' or ann['legibility'] != 'legible'):
            continue
        # '#' anywhere (except the bare '#') marks partially-corrupted labels
        if text != '#' and '#' in text:
            continue
        if text.startswith('*') or text.endswith('*'):
            continue
        dst_img = crop_bbox(src_img, ann['bbox'], pad=2)
        name = f'img_{img_idx}_{ann_idx}.jpg'
        save_jpeg_like(dst_img, osp.join(dst_root, name), src_img)
        labels.append(f'{osp.basename(dst_root)}/{name} {text}')
    src_img.close()
    return labels


def convert(root, dst_image_path, dst_label_filename, annotation_filename,
            img_start_idx=0, nproc=1):
    ann = load_json(osp.join(root, annotation_filename))
    split = 'train' if 'train' in dst_label_filename else 'val'
    dst_root = osp.join(root, dst_image_path)
    os.makedirs(dst_root, exist_ok=True)
    tasks = []
    for i, img_info in enumerate(ann['imgs'].values()):
        if img_info['set'] != split:
            continue
        ann_ids = ann['imgToAnns'][str(img_info['id'])]
        anns = [ann['anns'][str(a)] for a in ann_ids]
        tasks.append((i + img_start_idx, img_info, anns))
    fn = partial(process_img, src_root=root, dst_root=dst_root)
    labels = [l for ls in run_parallel(fn, tasks, nproc) for l in ls]
    write_lines(osp.join(root, dst_label_filename), labels)
    return len(ann['imgs'])


def main():
    root = sys.argv[1]
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n = convert(root, 'image', 'train_label.txt', 'cocotext.v2.json', 0, nproc)
    convert(root, 'image_val', 'val_label.txt', 'cocotext.v2.json', n, nproc)
    print('Finish')


if __name__ == '__main__':
    main()
