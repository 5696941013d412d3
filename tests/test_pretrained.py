"""Pretrained-weight resolution: URL table, checksum cache, error paths.

Network is unavailable in this environment, so these tests exercise the
offline half (reference strhub/models/utils.py:14-22,65-70 equivalents):
filename/hash conventions, cache search, and checksum verification.
"""

import hashlib

import pytest

from parseq_tpu.utils import pretrained


REFERENCE_URLS = {
    'parseq-tiny': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq_tiny-e7a21b54.pt',
    'parseq-patch16-224': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq_small_patch16_224-fcf06f5a.pt',
    'parseq': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq-bb5792a6.pt',
    'abinet': 'https://github.com/baudm/parseq/releases/download/v1.0.0/abinet-1d1e373e.pt',
    'trba': 'https://github.com/baudm/parseq/releases/download/v1.0.0/trba-cfaed284.pt',
    'vitstr': 'https://github.com/baudm/parseq/releases/download/v1.0.0/vitstr-26d0fcf4.pt',
    'crnn': 'https://github.com/baudm/parseq/releases/download/v1.0.0/crnn-679d0e31.pt',
}


def test_weights_table_matches_reference():
    assert pretrained.WEIGHTS_URL == REFERENCE_URLS


def test_filename_and_hash_prefix():
    assert pretrained.expected_filename('parseq') == 'parseq-bb5792a6.pt'
    assert pretrained.expected_hash_prefix('parseq') == 'bb5792a6'
    assert pretrained.expected_hash_prefix('parseq-patch16-224') == 'fcf06f5a'
    with pytest.raises(pretrained.PretrainedWeightsError, match='available'):
        pretrained.expected_filename('nonexistent-model')


def test_sha256_prefix_check(tmp_path):
    f = tmp_path / 'w.pt'
    f.write_bytes(b'payload')
    digest = hashlib.sha256(b'payload').hexdigest()
    assert pretrained.sha256_prefix_ok(f, digest[:8])
    assert not pretrained.sha256_prefix_ok(f, 'deadbeef')


def test_find_cached_verifies_hash(tmp_path, monkeypatch):
    payload = b'fake released weights'
    prefix = hashlib.sha256(payload).hexdigest()[:8]
    monkeypatch.setitem(pretrained.WEIGHTS_URL, 'fake-model',
                        f'https://example.com/dl/fake_model-{prefix}.pt')
    monkeypatch.setenv('PARSEQ_TPU_CACHE', str(tmp_path))

    assert pretrained.find_cached('fake-model') is None  # not cached yet
    (tmp_path / f'fake_model-{prefix}.pt').write_bytes(payload)
    got = pretrained.find_cached('fake-model')
    assert got == tmp_path / f'fake_model-{prefix}.pt'

    # corrupted cache entry -> loud failure, not silent use
    (tmp_path / f'fake_model-{prefix}.pt').write_bytes(b'corrupted!')
    with pytest.raises(pretrained.PretrainedWeightsError, match='sha256'):
        pretrained.find_cached('fake-model')


def test_get_pretrained_path_error_is_actionable(tmp_path, monkeypatch):
    monkeypatch.setenv('PARSEQ_TPU_CACHE', str(tmp_path))
    monkeypatch.setattr(pretrained, 'download',
                        lambda *a, **k: (_ for _ in ()).throw(OSError('no network')))
    with pytest.raises(pretrained.PretrainedWeightsError) as e:
        pretrained.get_pretrained_path('parseq')
    # the error must tell the user the exact filename and where to put it
    assert 'parseq-bb5792a6.pt' in str(e.value)
    assert str(tmp_path) in str(e.value)

    with pytest.raises(pretrained.PretrainedWeightsError, match='not found in cache'):
        pretrained.get_pretrained_path('parseq', download_if_missing=False)


def test_load_from_checkpoint_pretrained_prefix(tmp_path, monkeypatch):
    """registry routes 'pretrained=<exp>' through the cache machinery."""
    from parseq_tpu.utils.registry import load_from_checkpoint

    monkeypatch.setenv('PARSEQ_TPU_CACHE', str(tmp_path))
    monkeypatch.setattr(pretrained, 'download',
                        lambda *a, **k: (_ for _ in ()).throw(OSError('no network')))
    with pytest.raises(pretrained.PretrainedWeightsError):
        load_from_checkpoint('pretrained=crnn')
