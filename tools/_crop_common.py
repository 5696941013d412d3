"""Shared helpers for the dataset converters (no mmcv/mmocr dependency)."""

from __future__ import annotations

import json
import math
import multiprocessing as mp
import os
import os.path as osp

import numpy as np
from PIL import Image


def load_json(path):
    with open(path, encoding='utf-8') as f:
        return json.load(f)


def save_jpeg_like(dst_img, dst_path, src_img):
    """Save preserving source JPEG quantization tables when possible."""
    try:
        dst_img.save(dst_path, qtables=src_img.quantization)
    except (AttributeError, ValueError, OSError):
        dst_img.save(dst_path, quality=95)


def crop_bbox(src_img, bbox, pad=0):
    x, y, w, h = bbox
    sw, sh = src_img.size
    x, y = max(0, math.floor(x) - pad), max(0, math.floor(y) - pad)
    w, h = math.ceil(w), math.ceil(h)
    x2, y2 = min(sw, x + w + 2 * pad), min(sh, y + h + 2 * pad)
    return src_img.crop((x, y, x2, y2))


def crop_points(src_img, points):
    pts = np.asarray(points).reshape(-1, 2)
    x1, y1 = pts.min(axis=0)
    x2, y2 = pts.max(axis=0)
    return src_img.crop((x1, y1, x2, y2))


def rectify_image_pose(image, top_left, points):
    """Heuristic rotation fix for rotated text (reference
    textocr_converter.py:27-48)."""
    points = np.asarray(points).reshape(-1, 2)
    dist = ((points - np.asarray(top_left)) ** 2).sum(axis=1)
    left_mid = (points[0] + points[-1]) / 2
    right_corners = ((points - left_mid) ** 2).sum(axis=1).argsort()[-2:]
    right_mid = points[right_corners].sum(axis=0) / 2
    d_x, d_y = np.abs(right_mid - left_mid)
    if dist[0] + dist[-1] <= dist[right_corners].sum():
        rot = 0 if d_x >= d_y else 90
    else:
        rot = 180 if d_x >= d_y else -90
    return image.rotate(rot, expand=True) if rot else image


def run_parallel(fn, tasks, nproc=1):
    if nproc <= 1:
        return [fn(t) for t in tasks]
    with mp.Pool(nproc) as pool:
        return pool.map(fn, tasks)


def write_lines(path, lines):
    with open(path, 'w', encoding='utf-8') as f:
        for line in lines:
            f.write(line + '\n')
