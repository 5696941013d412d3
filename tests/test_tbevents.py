"""From-scratch tfevents writer validated against the real TensorBoard reader.

The writer (parseq_tpu/utils/tbevents.py) hand-encodes TFRecord framing,
masked CRC32C, and the Event/Summary protobufs; these tests confirm the
bytes are accepted by TensorBoard's own EventAccumulator (the authoritative
consumer), plus round-trip through our own parser and CRC reference vectors.
"""

import json

import numpy as np
import pytest

from parseq_tpu.utils.tbevents import (
    TBEventWriter, crc32c, masked_crc, read_events)


def test_crc32c_reference_vectors():
    # Published CRC-32C (Castagnoli) test vectors (RFC 3720 appendix B.4).
    assert crc32c(b'') == 0x00000000
    assert crc32c(b'a') == 0xC1D04330
    assert crc32c(b'123456789') == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_masked_crc_matches_tfrecord_mask():
    # mask(crc) = rotr15(crc) + 0xa282ead8 (TFRecord spec)
    crc = crc32c(b'123456789')
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc(b'123456789') == expect


def test_own_roundtrip(tmp_path):
    w = TBEventWriter(tmp_path)
    w.add_scalars(1, {'loss': 2.5, 'lr': 1e-3})
    w.add_scalars(2, {'loss': 1.25})
    w.add_scalar(10, 'val_accuracy', 93.75)
    w.close()
    events = read_events(w.path)
    assert events[0] == (1, {'loss': 2.5, 'lr': pytest.approx(1e-3)})
    assert events[1] == (2, {'loss': 1.25})
    assert events[2] == (10, {'val_accuracy': 93.75})


def test_tensorboard_reads_our_files(tmp_path):
    """The real TensorBoard EventAccumulator must accept our bytes."""
    ea_mod = pytest.importorskip(
        'tensorboard.backend.event_processing.event_accumulator')

    w = TBEventWriter(tmp_path)
    steps = [1, 50, 100, 1000]
    for i, s in enumerate(steps):
        w.add_scalars(s, {'train/loss': 3.0 / (i + 1), 'val_NED': 80.0 + i})
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path),
                                  size_guidance={ea_mod.SCALARS: 0})
    acc.Reload()
    tags = set(acc.Tags()['scalars'])
    assert tags == {'train/loss', 'val_NED'}
    loss = acc.Scalars('train/loss')
    assert [e.step for e in loss] == steps
    np.testing.assert_allclose([e.value for e in loss],
                               [3.0 / (i + 1) for i in range(4)], rtol=1e-6)
    ned = acc.Scalars('val_NED')
    assert [e.value for e in ned] == [80.0 + i for i in range(4)]


def test_nan_and_nonnumeric_dropped(tmp_path):
    w = TBEventWriter(tmp_path)
    w.add_scalars(1, {'ok': 1.0, 'bad': float('nan'), 'name': 'str'})
    w.add_scalars(2, {'bad': float('nan')})  # all dropped -> no event
    w.close()
    events = read_events(w.path)
    assert events == [(1, {'ok': 1.0})]


def test_jsonl_converter(tmp_path):
    jsonl = tmp_path / 'metrics.jsonl'
    with open(jsonl, 'w') as f:
        f.write(json.dumps({'step': 50, 'loss': 2.0, 'lr': 7e-4, 'epoch': 0}) + '\n')
        f.write(json.dumps({'step': 1000, 'val_accuracy': 91.0, 'val_NED': 97.0}) + '\n')
        f.write(json.dumps({'note': 'no step, skipped'}) + '\n')

    import sys
    sys.path.insert(0, 'tools')
    try:
        from jsonl_to_tfevents import convert
    finally:
        sys.path.pop(0)
    path = convert(jsonl, tmp_path / 'tb')
    events = read_events(path)
    assert events[0][0] == 50 and events[0][1]['loss'] == 2.0
    assert events[1][0] == 1000 and events[1][1]['val_accuracy'] == 91.0
    assert len(events) == 2


def test_train_loop_writes_tfevents(tmp_path):
    """End-to-end: train() emits a TB-readable event file alongside JSONL."""
    import io

    from PIL import Image, ImageDraw

    from parseq_tpu.train.loop import train
    from parseq_tpu.utils.config import compose, parse_cli_overrides
    from .test_lmdb import make_str_db

    def img_bytes(text):
        im = Image.new('RGB', (48, 16), (255, 255, 255))
        ImageDraw.Draw(im).text((1, 1), text, fill=(0, 0, 0))
        b = io.BytesIO()
        im.save(b, 'PNG')
        return b.getvalue()

    root = tmp_path / 'data'
    words = ['ab', 'cd', 'ef', 'gh']
    make_str_db(root / 'train' / 'real' / 's', [(img_bytes(w), w) for w in words * 4])
    make_str_db(root / 'val' / 's', [(img_bytes(w), w) for w in words])

    cfg = compose(None, overrides=parse_cli_overrides([
        'model.img_size=[16,32]', 'model.enc_depth=1', 'model.embed_dim=32',
        'model.enc_num_heads=2', 'model.dec_num_heads=4',
        'model.max_label_length=5', 'model.batch_size=4',
        'model.decode_ar=false', 'model.refine_iters=0',
        f'data.root_dir={root}', 'data.num_workers=0', 'data.augment=false',
        'trainer.devices=1', 'trainer.swa=false', 'trainer.val_check_interval=2']))
    train(cfg, tmp_path / 'run', max_steps=2)

    files = list((tmp_path / 'run' / 'tb').glob('events.out.tfevents.*'))
    assert len(files) == 1
    events = read_events(files[0])
    tags = {t for _, s in events for t in s}
    assert {'val_accuracy', 'val_NED', 'val_loss', 'hp_metric'} <= tags


def test_numpy_scalars_accepted(tmp_path):
    """np.float32 is not a builtin-float subclass; must not be dropped (ADVICE r2)."""
    w = TBEventWriter(tmp_path)
    w.add_scalars(1, {'a': np.float32(2.5), 'b': np.int64(3), 'bad': np.float32('nan')})
    w.close()
    events = read_events(w.path)
    assert events == [(1, {'a': 2.5, 'b': 3.0})]
