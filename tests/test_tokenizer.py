import numpy as np
import pytest

from parseq_tpu.data import CharsetAdapter, CTCTokenizer, Tokenizer
from parseq_tpu.data.charset import CHARSET_36, CHARSET_62, CHARSET_94


def test_id_layout_matches_reference():
    # Reference layout (strhub/data/utils.py:107-111): EOS=0, chars 1..N, BOS=N+1, PAD=N+2
    tok = Tokenizer(CHARSET_36)
    assert tok.eos_id == 0
    assert tok.bos_id == len(CHARSET_36) + 1
    assert tok.pad_id == len(CHARSET_36) + 2
    assert len(tok) == len(CHARSET_36) + 3
    assert tok._tok2ids('0') == [1]
    assert tok._tok2ids('z') == [36]


def test_encode_shape_and_content():
    tok = Tokenizer(CHARSET_36)
    ids = tok.encode(['ab', 'hello'], max_label_length=25)
    assert ids.shape == (2, 27)
    assert ids.dtype == np.int32
    a = tok._tok2ids('ab')
    assert ids[0, 0] == tok.bos_id
    assert ids[0, 1:3].tolist() == a
    assert ids[0, 3] == tok.eos_id
    assert (ids[0, 4:] == tok.pad_id).all()
    assert ids[1, 6] == tok.eos_id


def test_encode_truncates_overlong():
    tok = Tokenizer(CHARSET_36)
    ids = tok.encode(['a' * 40], max_label_length=25)
    assert ids.shape == (1, 27)
    assert ids[0, 26] == tok.eos_id  # EOS still present at the last slot


def test_decode_roundtrip():
    tok = Tokenizer(CHARSET_36)
    labels = ['hello', 'a', '123xyz', '']
    ids = tok.encode(labels, 25)
    C = len(tok)
    # Build fake distributions: one-hot of [chars..., EOS, junk...] (positions after BOS)
    dists = np.full((len(labels), 26, C), 1e-6, dtype=np.float32)
    for n in range(len(labels)):
        for t in range(26):
            dists[n, t, ids[n, t + 1]] = 1.0
    preds, probs = tok.decode(dists)
    assert preds == labels
    # probs include EOS prob -> length+1
    assert all(len(p) == len(lab) + 1 for p, lab in zip(probs, labels))


def test_decode_no_eos():
    tok = Tokenizer(CHARSET_36)
    C = len(tok)
    dists = np.zeros((1, 3, C), dtype=np.float32)
    dists[0, :, 1] = 1.0  # '0' everywhere, never EOS
    preds, probs = tok.decode(dists)
    assert preds == ['000']
    assert len(probs[0]) == 3


def test_ctc_layout_and_best_path():
    tok = CTCTokenizer(CHARSET_36)
    assert tok.blank_id == 0
    assert len(tok) == len(CHARSET_36) + 1
    C = len(tok)
    # sequence: a a blank a b b -> "aab"
    a, b = tok._tok2ids('a')[0], tok._tok2ids('b')[0]
    seq = [a, a, 0, a, b, b]
    dists = np.zeros((1, len(seq), C), dtype=np.float32)
    for t, s in enumerate(seq):
        dists[0, t, s] = 1.0
    preds, _ = tok.decode(dists)
    assert preds == ['aab']


def test_ctc_encode():
    tok = CTCTokenizer(CHARSET_36)
    ids = tok.encode(['ab'], 25)
    assert ids.shape == (1, 25)
    assert ids[0, :2].tolist() == tok._tok2ids('ab')
    assert (ids[0, 2:] == 0).all()
    assert tok.lengths(['ab', 'x' * 30], 25).tolist() == [2, 25]


@pytest.mark.parametrize(
    'charset,label,expected',
    [
        (CHARSET_36, 'Hello!', 'hello'),  # lowercase fold + strip punct
        (CHARSET_62, 'Hello!', 'Hello'),  # mixed keeps case
        (CHARSET_94, 'Hello!', 'Hello!'),
        ('ABC', 'abcd', 'ABC'),  # uppercase-only charset folds up
    ],
)
def test_charset_adapter(charset, label, expected):
    assert CharsetAdapter(charset)(label) == expected
