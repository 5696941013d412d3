#!/usr/bin/env python3
"""TextOCR -> cropped word images + label lists (reference
tools/textocr_converter.py, self-contained). Supports --rectify_pose.

Usage: python tools/textocr_converter.py ROOT_PATH [N_PROC] [--rectify_pose]
"""

import argparse
import math
import os
import os.path as osp
import sys
from functools import partial

from PIL import Image

sys.path.insert(0, osp.dirname(__file__))
from _crop_common import load_json, rectify_image_pose, run_parallel, save_jpeg_like, write_lines  # noqa: E402


def process_img(task, src_root, dst_root):
    img_idx, img_info, anns, rectify_pose = task
    src_img = Image.open(osp.join(src_root, img_info['file_name']))
    labels = []
    for ann_idx, ann in enumerate(anns):
        text = ann['utf8_string']
        # '.' marks illegible/non-English words in TextOCR
        if text == '.':
            continue
        x, y, w, h = ann['bbox']
        x, y = max(0, math.floor(x)), max(0, math.floor(y))
        w, h = math.ceil(w), math.ceil(h)
        dst_img = src_img.crop((x, y, x + w, y + h))
        if rectify_pose:
            dst_img = rectify_image_pose(dst_img, (x, y), ann['points'])
        name = f'img_{img_idx}_{ann_idx}.jpg'
        save_jpeg_like(dst_img, osp.join(dst_root, name), src_img)
        labels.append(f'{osp.basename(dst_root)}/{name} {text}')
    src_img.close()
    return labels


def convert(root, dst_image_path, dst_label_filename, annotation_filename,
            img_start_idx=0, nproc=1, rectify_pose=False):
    ann = load_json(osp.join(root, annotation_filename))
    dst_root = osp.join(root, dst_image_path)
    os.makedirs(dst_root, exist_ok=True)
    tasks = []
    for i, img_info in enumerate(ann['imgs'].values()):
        ann_ids = ann['imgToAnns'][str(img_info['id'])]
        anns = [ann['anns'][str(a)] for a in ann_ids]
        tasks.append((i + img_start_idx, img_info, anns, rectify_pose))
    fn = partial(process_img, src_root=root, dst_root=dst_root)
    labels = [l for ls in run_parallel(fn, tasks, nproc) for l in ls]
    write_lines(osp.join(root, dst_label_filename), labels)
    return len(ann['imgs'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('root_path')
    ap.add_argument('n_proc', nargs='?', type=int, default=1)
    ap.add_argument('--rectify_pose', action='store_true')
    a = ap.parse_args()
    n = convert(a.root_path, 'image', 'train_label.txt',
                'TextOCR_0.1_train.json', 0, a.n_proc, a.rectify_pose)
    convert(a.root_path, 'image_val', 'val_label.txt',
            'TextOCR_0.1_val.json', n, a.n_proc, a.rectify_pose)
    print('Finish')


if __name__ == '__main__':
    main()
