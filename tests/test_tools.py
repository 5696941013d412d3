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
                        str(imgs), str(gt), str(out)], capture_output=True, text=True, timeout=900)
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
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    with LmdbReader(filtered) as rd:
        assert int(rd.get(b'num-samples')) == 2
        assert rd.get(b'label-000000001') == b'hello'
        assert rd.get(b'label-000000002') == b'world extra'


def _run_tool(name, *args):
    r = subprocess.run([sys.executable, str(REPO / 'tools' / name), *map(str, args)],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_mlt19_converter(tmp_path):
    (tmp_path / 'gt.txt').write_text(
        'word_1.png,Latin,hello\n'
        'word_2.png,Arabic,مرحبا\n'
        'word_3.png,Symbols,$5,99\n'   # commas inside the transcription
        'word_4.png,Latin,\n'          # empty label dropped
        'word_5.png,Chinese,text\n',
        encoding='utf8')
    _run_tool('mlt19_converter.py', tmp_path)
    got = (tmp_path / 'lmdb.txt').read_text(encoding='utf8').splitlines()
    assert got == ['word_1.png\thello', 'word_3.png\t$5,99']


def test_coco_text_converter(tmp_path):
    for split, body in [('train', '1000\thi\nimg_1,STOP\nimg_2,|ca,fe|\n'),
                        ('val', 'img_9,  word  \n')]:
        (tmp_path / f'{split}_words_gt.txt').write_text(body, encoding='utf8')
    _run_tool('coco_text_converter.py', tmp_path)
    train = (tmp_path / 'train_lmdb.txt').read_text(encoding='utf8').splitlines()
    # the tab-separated header line has no comma -> skipped
    assert train == ['train_words/img_1.jpg\tSTOP', 'train_words/img_2.jpg\tca,fe']
    val = (tmp_path / 'val_lmdb.txt').read_text(encoding='utf8').splitlines()
    assert val == ['val_words/img_9.jpg\tword']


def test_case_sensitive_converter(tmp_path):
    (tmp_path / 'IMG').mkdir()
    (tmp_path / 'label').mkdir()
    for i, word in enumerate(['Foo', 'BaR', 'baz'], start=1):
        _write_img(tmp_path / 'IMG' / f'{i}.png')
        (tmp_path / 'label' / f'{i}.txt').write_text(word + '\nsecond line ignored\n')
    _run_tool('case_sensitive_str_datasets_converter.py', tmp_path)
    got = (tmp_path / 'lmdb.txt').read_text(encoding='utf-8').splitlines()
    assert got == ['IMG/1.png\tFoo', 'IMG/2.png\tBaR', 'IMG/3.png\tbaz']


def test_art_converter(tmp_path):
    import json

    labels = {
        'gt_1': [{'language': 'Latin', 'illegibility': False, 'transcription': 'SHOP'}],
        'gt_2': [{'language': 'Chinese', 'illegibility': False, 'transcription': 'kept?no'}],
        'gt_3': [{'language': 'Latin', 'illegibility': True, 'transcription': 'blurry'}],
        'gt_4': [{'language': 'Latin', 'illegibility': False, 'transcription': '###'}],
        'gt_5': [{'language': 'Latin', 'illegibility': False, 'transcription': 'LocaL#3'}],
        'gt_6': [{'language': 'latin', 'illegibility': False, 'transcription': '  pad  '}],
        'gt_7': [{'language': 'Latin', 'illegibility': False, 'transcription': ''}],
    }
    src = tmp_path / 'train_task2_labels.json'
    src.write_text(json.dumps(labels), encoding='utf8')
    out = tmp_path / 'gt.txt'
    _run_tool('art_converter.py', src, '--out', out)
    got = out.read_text(encoding='utf8').splitlines()
    assert got == ['train_task2_images/gt_1.jpg\tSHOP',
                   'train_task2_images/gt_5.jpg\tLocaL#3',
                   'train_task2_images/gt_6.jpg\tpad']


def test_abinet_lm_acc_tool(tmp_path):
    """Offline smoke of the ABINet LM probe (reference tools/
    test_abinet_lm_acc.py): tiny ABINet ckpt + tiny LMDB -> reported word
    accuracy; one-hot GT feeding and length handling exercised end-to-end."""
    import contextlib
    import io as _io
    import sys

    import jax.numpy as jnp

    from parseq_tpu.utils.checkpoint import save_checkpoint
    from parseq_tpu.utils.registry import create_model

    from .test_lmdb import _png_bytes, make_str_db

    m = create_model('abinet', dtype=jnp.float32, charset_train='abcdef',
                     charset_test='abcdef', img_size=[32, 64], max_label_length=7,
                     nhead=4, d_inner=128, v_num_layers=1, l_num_layers=1,
                     iter_size=1)
    ckpt = tmp_path / 'abinet.ckpt'
    save_checkpoint(ckpt, m.params, m.cfg,
                    meta={'name': 'abinet', 'model_config': m.raw_config})
    make_str_db(tmp_path / 'data' / 'test' / 'IIIT5k',
                [(_png_bytes(), 'abc'), (_png_bytes(), 'fed'), (_png_bytes(), 'dead')])

    sys.path.insert(0, 'tools')
    try:
        from test_abinet_lm_acc import main as lm_main
    finally:
        sys.path.pop(0)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        lm_main([str(ckpt), '--data_root', str(tmp_path / 'data'),
                 '--splits', 'test/IIIT5k', '--batch_size', '4'])
    out = buf.getvalue()
    assert 'LM word accuracy:' in out and '/3)' in out


def test_certify_pretrained_roundtrip(tmp_path, monkeypatch):
    """Full certify_pretrained path with a synthetic released-format .pt:
    twin state_dict -> sha256-prefix cache file -> convert -> demo regression
    -> JSON verdict. (VERDICT r2 item 5: the accuracy-certification command
    must be known-working before real weights appear.)"""
    import hashlib
    import json

    import torch

    from parseq_tpu.utils import pretrained
    from tests.torch_twin import TwinPARSeq

    torch.manual_seed(0)
    # Full released PARSeq-S geometry: load_pretrained composes the 'parseq'
    # experiment config, so the state_dict must match it.
    twin = TwinPARSeq(num_tokens=97)
    f = tmp_path / 'raw.pt'
    torch.save(twin.state_dict(), f)
    prefix = hashlib.sha256(f.read_bytes()).hexdigest()[:8]
    cached = tmp_path / f'parseq-{prefix}.pt'
    f.rename(cached)

    monkeypatch.setitem(pretrained.WEIGHTS_URL, 'parseq',
                        f'https://example.com/dl/parseq-{prefix}.pt')
    monkeypatch.setenv('PARSEQ_TPU_CACHE', str(tmp_path))

    sys.path.insert(0, str(REPO / 'tools'))
    try:
        import certify_pretrained
    finally:
        sys.path.pop(0)

    out = tmp_path / 'certify.json'
    rc = certify_pretrained.main(['parseq', '--out', str(out)])
    verdict = json.loads(out.read_text())

    # Random weights cannot reproduce the README fixtures: the tool must
    # complete the whole pipeline, record all six demo predictions, and
    # report failure (nonzero exit + demo_ok False) rather than crash.
    assert rc == 1
    assert verdict['demo_ok'] is False
    assert len(verdict['demo']) == 6
    for name, entry in verdict['demo'].items():
        assert isinstance(entry['pred'], str)
        assert entry['expected'] is not None
        assert entry['match'] is False or entry['match'] is True
