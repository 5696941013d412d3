"""LMDB format reader/writer roundtrip + dataset filtering semantics."""

import io

import numpy as np
import pytest
from PIL import Image

from parseq_tpu.data.lmdb import LmdbReader, LmdbWriter
from parseq_tpu.data.dataset import LmdbDataset, build_tree_dataset


def _png_bytes(w=20, h=10, color=(255, 0, 0)):
    img = Image.new('RGB', (w, h), color)
    buf = io.BytesIO()
    img.save(buf, 'PNG')
    return buf.getvalue()


def test_roundtrip_small(tmp_path):
    p = tmp_path / 'db'
    with LmdbWriter(p) as w:
        w.put(b'alpha', b'1')
        w.put(b'beta', b'2' * 100)
        w.put(b'gamma', b'')
    with LmdbReader(p) as r:
        assert len(r) == 3
        assert r.get(b'alpha') == b'1'
        assert r.get(b'beta') == b'2' * 100
        assert r.get(b'gamma') == b''
        assert r.get(b'missing') is None
        assert [k for k, _ in r.items()] == [b'alpha', b'beta', b'gamma']


def test_roundtrip_many_keys_multilevel(tmp_path):
    """Enough keys to force multiple leaf pages and branch levels."""
    p = tmp_path / 'db'
    rng = np.random.default_rng(0)
    kv = {f'key-{i:09d}'.encode(): rng.bytes(rng.integers(1, 200)) for i in range(5000)}
    with LmdbWriter(p) as w:
        for k, v in kv.items():
            w.put(k, v)
    with LmdbReader(p) as r:
        assert len(r) == 5000
        # spot check + full scan
        for k in list(kv)[::321]:
            assert r.get(k) == kv[k]
        got = dict(r.items())
        assert got == kv


def test_roundtrip_overflow_values(tmp_path):
    """Values larger than a page go to overflow pages (like JPEG blobs)."""
    p = tmp_path / 'db'
    rng = np.random.default_rng(1)
    big = {f'img-{i}'.encode(): rng.bytes(3000 + i * 4096) for i in range(5)}
    with LmdbWriter(p) as w:
        for k, v in big.items():
            w.put(k, v)
        w.put(b'small', b'x')
    with LmdbReader(p) as r:
        for k, v in big.items():
            assert r.get(k) == v
        assert r.get(b'small') == b'x'


def make_str_db(path, samples):
    """samples: list of (image_bytes, label)."""
    with LmdbWriter(path) as w:
        w.put(b'num-samples', str(len(samples)).encode())
        for i, (img, label) in enumerate(samples, start=1):
            w.put(f'image-{i:09d}'.encode(), img)
            w.put(f'label-{i:09d}'.encode(), label.encode())


def test_lmdb_dataset_filtering(tmp_path):
    db = tmp_path / 'test_ds'
    samples = [
        (_png_bytes(), 'hello'),
        (_png_bytes(), 'Hi There'),     # whitespace removed -> HiThere -> hithere
        (_png_bytes(), 'x' * 30),       # too long -> dropped
        (_png_bytes(), '!!!'),          # empty after charset -> dropped
        (_png_bytes(), 'café'),    # NFKD -> 'cafe'
    ]
    make_str_db(db, samples)
    ds = LmdbDataset(str(db), charset='abcdefghijklmnopqrstuvwxyz0123456789',
                     max_label_len=25)
    assert len(ds) == 3
    assert ds.labels == ['hello', 'hithere', 'cafe']
    img, label = ds[0]
    assert label == 'hello'
    assert img.size == (20, 10)


def test_build_tree_dataset(tmp_path):
    root = tmp_path / 'train'
    make_str_db(root / 'a', [(_png_bytes(), 'one')])
    make_str_db(root / 'nested' / 'b', [(_png_bytes(), 'two'), (_png_bytes(), 'three')])
    ds = build_tree_dataset(root, 'abcdefghijklmnopqrstuvwxyz', 25)
    assert len(ds) == 3
    labels = sorted(ds[i][1] for i in range(3))
    assert labels == ['one', 'three', 'two']


def test_native_reader_matches_python(tmp_path):
    """C++ reader returns identical results to the Python mmap reader."""
    import pytest

    from parseq_tpu.data import native

    if native.load() is None:
        pytest.skip('no C++ toolchain')
    p = tmp_path / 'db'
    rng = np.random.default_rng(7)
    kv = {f'k{i:06d}'.encode(): rng.bytes(int(rng.integers(1, 9000))) for i in range(3000)}
    with LmdbWriter(p) as w:
        for k, v in kv.items():
            w.put(k, v)
    nat = native.NativeLmdbReader(p)
    with LmdbReader(p) as py:
        assert len(nat) == len(py) == 3000
        for k in list(kv)[::97] + [b'missing', b'k999999']:
            assert nat.get(k) == py.get(k)
    nat.close()


def test_open_reader_prefers_native(tmp_path):
    from parseq_tpu.data import native
    from parseq_tpu.data.lmdb import open_reader

    p = tmp_path / 'db'
    with LmdbWriter(p) as w:
        w.put(b'a', b'1')
    with open_reader(p) as rd:
        assert rd.get(b'a') == b'1'
        if native.load() is not None:
            assert isinstance(rd, native.NativeLmdbReader)
