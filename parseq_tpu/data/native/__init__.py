"""ctypes bindings for the native C++ LMDB reader.

Builds lmdb_reader.cpp with g++ on first use (cached next to the source);
returns None from `load()` if no toolchain is available so callers fall back
to the pure-Python mmap reader.
"""

from __future__ import annotations

import ctypes
import logging
import threading
from pathlib import Path

log = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / 'lmdb_reader.cpp'
_SO = _HERE / '_lmdb_reader.so'
_JPEG_SRC = _HERE / 'jpeg_decode.cpp'
_JPEG_SO = _HERE / '_jpeg_decode.so'
_lock = threading.Lock()
_lib = None
_tried = False
_jpeg_lib = None
_jpeg_tried = False


def load():
    """-> ctypes CDLL with the parseq_lmdb_* symbols, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        from parseq_tpu.utils.native_build import ensure_built
        if not ensure_built(_SRC, _SO):
            log.info('native LMDB reader unavailable; using Python reader')
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            log.info(f'native LMDB reader load failed ({e!r})')
            return None
        lib.parseq_lmdb_open.argtypes = [ctypes.c_char_p]
        lib.parseq_lmdb_open.restype = ctypes.c_void_p
        lib.parseq_lmdb_close.argtypes = [ctypes.c_void_p]
        lib.parseq_lmdb_close.restype = None
        lib.parseq_lmdb_entries.argtypes = [ctypes.c_void_p]
        lib.parseq_lmdb_entries.restype = ctypes.c_uint64
        lib.parseq_lmdb_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_size_t,
                                        ctypes.POINTER(ctypes.c_size_t)]
        lib.parseq_lmdb_get.restype = ctypes.c_void_p
        _lib = lib
        return _lib


def load_jpeg():
    """-> ctypes CDLL with parseq_jpeg_decode_resize/parseq_bicubic_u8, or
    None (no toolchain / no libjpeg) so callers fall back to PIL."""
    global _jpeg_lib, _jpeg_tried
    with _lock:
        if _jpeg_lib is not None or _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        from parseq_tpu.utils.native_build import ensure_built
        if not ensure_built(_JPEG_SRC, _JPEG_SO, extra_flags=('-O3', '-ljpeg')):
            log.info('native JPEG decoder unavailable; using PIL')
            return None
        try:
            lib = ctypes.CDLL(str(_JPEG_SO))
        except OSError as e:
            log.info(f'native JPEG decoder load failed ({e!r})')
            return None
        lib.parseq_jpeg_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p]
        lib.parseq_jpeg_decode_resize.restype = ctypes.c_int
        lib.parseq_bicubic_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p]
        lib.parseq_bicubic_u8.restype = None
        lib.parseq_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.parseq_jpeg_dims.restype = ctypes.c_int
        lib.parseq_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
        lib.parseq_jpeg_decode.restype = ctypes.c_int
        _jpeg_lib = lib
        return _jpeg_lib


def jpeg_decode_resize(data, img_size=(32, 128), fast_decode=True):
    """JPEG bytes -> (H, W, 3) uint8 resized with PIL-exact bicubic, or
    None (unsupported source / native lib unavailable -> caller uses PIL).

    Bit-identical to Image.open + draft + convert('RGB') + BICUBIC resize
    (fuzz-verified incl. grayscale and DCT-scaled paths,
    tests/test_data_pipeline.py) at 1.3-1.8x PIL's single-core rate."""
    lib = load_jpeg()
    if lib is None:
        return None
    import numpy as np

    data = bytes(data)
    h, w = img_size
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.parseq_jpeg_decode_resize(
        data, len(data), w, h, int(bool(fast_decode)),
        out.ctypes.data_as(ctypes.c_char_p))
    return out if rc == 0 else None


def jpeg_decode(data):
    """JPEG bytes -> full-resolution (H, W, 3) uint8 RGB, or None.

    TRAINING-path decode: RandAugment must see the full-resolution image
    before any resize (reference transform order, strhub/data/module.py:
    68-82), so the fused decode+resize above doesn't apply. Decode bytes are
    identical to PIL's (same libjpeg-turbo); grayscale sources come back as
    replicated-channel RGB exactly like Image.convert('RGB')."""
    lib = load_jpeg()
    if lib is None:
        return None
    import numpy as np

    data = bytes(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.parseq_jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.parseq_jpeg_decode(data, len(data),
                                out.ctypes.data_as(ctypes.c_char_p))
    return out if rc == 0 else None


def bicubic_resize_u8(arr, img_size=(32, 128)):
    """(H, W, 3) uint8 RGB -> PIL-exact bicubic resize to img_size, or None.

    Same fixed-point resample kernel the fused decode path uses
    (jpeg_decode.cpp resample), exposed for arrays already in memory —
    e.g. post-augment training images."""
    lib = load_jpeg()
    if lib is None:
        return None
    import numpy as np

    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        return None
    in_h, in_w = arr.shape[:2]
    h, w = img_size
    out = np.empty((h, w, 3), np.uint8)
    lib.parseq_bicubic_u8(arr.ctypes.data_as(ctypes.c_char_p), in_w, in_h,
                          w, h, out.ctypes.data_as(ctypes.c_char_p))
    return out


class NativeLmdbReader:
    """Same read API as data.lmdb.LmdbReader, backed by the C++ core."""

    def __init__(self, path, lib=None):
        self._lib = lib or load()
        if self._lib is None:
            raise RuntimeError('native LMDB reader unavailable')
        p = Path(path)
        if p.is_dir():
            p = p / 'data.mdb'
        self.path = p
        self._h = self._lib.parseq_lmdb_open(str(p).encode())
        if not self._h:
            raise OSError(f'{p}: not a readable LMDB database')

    def close(self):
        if self._h:
            self._lib.parseq_lmdb_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __len__(self):
        return int(self._lib.parseq_lmdb_entries(self._h))

    def get(self, key: bytes):
        vlen = ctypes.c_size_t()
        ptr = self._lib.parseq_lmdb_get(self._h, key, len(key), ctypes.byref(vlen))
        if not ptr:
            return None
        return ctypes.string_at(ptr, vlen.value)
