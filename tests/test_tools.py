"""Offline tools: create_lmdb_dataset + filter_lmdb end-to-end."""

import io
import subprocess
import sys
from pathlib import Path

from PIL import Image

from parseq_tpu.data.lmdb import LmdbReader

REPO = Path(__file__).resolve().parents[1]


def _write_img(path, w=20, h=10):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new('RGB', (w, h), (10, 200, 30)).save(path)


def test_create_and_filter_lmdb(tmp_path):
    imgs = tmp_path / 'imgs'
    _write_img(imgs / 'a.png', 20, 10)
    _write_img(imgs / 'b.png', 4, 4)  # too small for min dim 8
    _write_img(imgs / 'c.png', 30, 12)
    gt = tmp_path / 'gt.txt'
    gt.write_text('a.png hello\nb.png tiny\nc.png world extra\n')

    out = tmp_path / 'db'
    r = subprocess.run([sys.executable, str(REPO / 'tools/create_lmdb_dataset.py'),
                        str(imgs), str(gt), str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with LmdbReader(out) as rd:
        assert int(rd.get(b'num-samples')) == 3
        assert rd.get(b'label-000000001') == b'hello'
        assert rd.get(b'label-000000003') == b'world extra'  # maxsplit=1 keeps spaces
        img = Image.open(io.BytesIO(rd.get(b'image-000000001')))
        assert img.size == (20, 10)

    filtered = tmp_path / 'db_filtered'
    r = subprocess.run([sys.executable, str(REPO / 'tools/filter_lmdb.py'),
                        str(out), '--output', str(filtered), '--min_image_dim', '8'],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with LmdbReader(filtered) as rd:
        assert int(rd.get(b'num-samples')) == 2
        assert rd.get(b'label-000000001') == b'hello'
        assert rd.get(b'label-000000002') == b'world extra'
