"""Evaluation metrics (reference base.py:112-143 semantics).

`edit_distance_batch` scores a whole batch through a C++ core (built with
g++ on first use, cached next to editdist.cpp) — the per-sample Python DP
was the eval host-path bottleneck at TPU throughput. Falls back to the pure
Python DP when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / 'editdist.cpp'
_SO = _HERE / '_editdist.so'
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        from parseq_tpu.utils.native_build import ensure_built
        if not ensure_built(_SRC, _SO):
            log.info('native editdist unavailable; using Python DP')
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            log.info(f'native editdist load failed ({e!r})')
            return None
        u32p = np.ctypeslib.ndpointer(np.uint32, flags='C_CONTIGUOUS')
        i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
        lib.parseq_editdist_batch.argtypes = [u32p, i64p, u32p, i64p,
                                              ctypes.c_int64, i32p]
        lib.parseq_editdist_batch.restype = None
        _lib = lib
        return _lib


def _pack(strings):
    """list[str] -> (flat uint32 codepoints, int64 offsets[n+1])."""
    offsets = np.zeros(len(strings) + 1, np.int64)
    for i, s in enumerate(strings):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.empty(int(offsets[-1]), np.uint32)
    for i, s in enumerate(strings):
        if s:
            flat[offsets[i]:offsets[i + 1]] = np.frombuffer(
                s.encode('utf-32-le'), np.uint32)
    return flat, offsets


def edit_distance_batch(preds, gts) -> np.ndarray:
    """Levenshtein distance for each (pred, gt) pair -> int32 (N,)."""
    assert len(preds) == len(gts)
    lib = _load()
    if lib is None:
        return np.asarray([edit_distance(p, g) for p, g in zip(preds, gts)],
                          np.int32)
    a, ao = _pack(preds)
    b, bo = _pack(gts)
    out = np.empty(len(preds), np.int32)
    lib.parseq_editdist_batch(a, ao, b, bo, len(preds), out)
    return out


def ned_batch(preds, gts) -> np.ndarray:
    """ICDAR 2019 normalized edit distance terms, batched."""
    d = edit_distance_batch(preds, gts).astype(np.float64)
    denom = np.asarray([max(len(p), len(g)) for p, g in zip(preds, gts)],
                       np.float64)
    return np.where(denom > 0, d / np.maximum(denom, 1), 0.0)


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (insert/delete/substitute, unit costs) — the same
    metric as nltk.edit_distance used by the reference (base.py:21,138)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def ned(pred: str, gt: str) -> float:
    """ICDAR 2019 normalized edit distance term (summed per sample)."""
    denom = max(len(pred), len(gt))
    return edit_distance(pred, gt) / denom if denom else 0.0
