#!/usr/bin/env python3
"""OpenVINO Open Images annotations -> cropped word images + label lists
(reference tools/openvino_converter.py, self-contained).

Usage: python tools/openvino_converter.py ROOT_PATH [N_PROC]
"""

import os
import os.path as osp
import sys
from functools import partial

from PIL import Image

sys.path.insert(0, osp.dirname(__file__))
from _crop_common import crop_bbox, load_json, run_parallel, save_jpeg_like, write_lines  # noqa: E402


def process_img(task, src_root, dst_root):
    img_idx, img_info, anns = task
    src_img = Image.open(osp.join(src_root, img_info['file_name']))
    labels = []
    for ann_idx, ann in enumerate(anns):
        attrs = ann['attributes']
        if not attrs['legible'] or attrs['language'] != 'english':
            continue
        dst_img = crop_bbox(src_img, ann['bbox'])
        name = f'img_{img_idx}_{ann_idx}.jpg'
        save_jpeg_like(dst_img, osp.join(dst_root, name), src_img)
        labels.append(f"{osp.basename(dst_root)}/{name} {attrs['transcription']}")
    src_img.close()
    return labels


def convert(root, dst_image_path, dst_label_filename, annotation_filename,
            img_start_idx=0, nproc=1):
    ann = load_json(osp.join(root, annotation_filename))
    dst_root = osp.join(root, dst_image_path)
    os.makedirs(dst_root, exist_ok=True)
    by_img = {}
    for a in ann['annotations']:
        by_img.setdefault(a['image_id'], []).append(a)
    tasks = [(i + img_start_idx, info, by_img.get(info['id'], []))
             for i, info in enumerate(ann['images'])]
    fn = partial(process_img, src_root=root, dst_root=dst_root)
    labels = [l for ls in run_parallel(fn, tasks, nproc) for l in ls]
    write_lines(osp.join(root, dst_label_filename), labels)
    return len(ann['images'])


def main():
    root = sys.argv[1]
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n = 0
    for s in '125f':
        n = convert(root, f'image_{s}', f'train_{s}_label.txt',
                    f'text_spotting_openimages_v5_train_{s}.json', n, nproc)
    convert(root, 'image_val', 'val_label.txt',
            'text_spotting_openimages_v5_validation.json', n, nproc)
    print('Finish')


if __name__ == '__main__':
    main()
