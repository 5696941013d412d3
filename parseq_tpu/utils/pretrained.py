"""Pretrained-weight resolution: URL table, checksum cache, conversion.

Offline equivalent of torch.hub's download/cache machinery as used by the
reference (strhub/models/utils.py:14-22,65-70): each released weight file is
named ``<model>-<8-hex-sha256-prefix>.pt`` and torch.hub's ``check_hash=True``
verifies that prefix after download. We reproduce the table, the filename
hash convention, a cache-directory search (including torch.hub's own cache,
so weights fetched by the reference are reused), and — when the environment
has network access — the download itself. Everything except the download
works fully offline.
"""

from __future__ import annotations

import hashlib
import os
import re
from pathlib import Path

WEIGHTS_URL = {
    'parseq-tiny': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq_tiny-e7a21b54.pt',
    'parseq-patch16-224': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq_small_patch16_224-fcf06f5a.pt',
    'parseq': 'https://github.com/baudm/parseq/releases/download/v1.0.0/parseq-bb5792a6.pt',
    'abinet': 'https://github.com/baudm/parseq/releases/download/v1.0.0/abinet-1d1e373e.pt',
    'trba': 'https://github.com/baudm/parseq/releases/download/v1.0.0/trba-cfaed284.pt',
    'vitstr': 'https://github.com/baudm/parseq/releases/download/v1.0.0/vitstr-26d0fcf4.pt',
    'crnn': 'https://github.com/baudm/parseq/releases/download/v1.0.0/crnn-679d0e31.pt',
}

_HASH_RE = re.compile(r'-([0-9a-f]{8,})\.pt$')


class PretrainedWeightsError(RuntimeError):
    pass


def expected_filename(experiment: str) -> str:
    try:
        return WEIGHTS_URL[experiment].rsplit('/', 1)[1]
    except KeyError:
        raise PretrainedWeightsError(
            f"No pretrained weights found for '{experiment}' "
            f'(available: {sorted(WEIGHTS_URL)})') from None


def expected_hash_prefix(experiment: str) -> str:
    m = _HASH_RE.search(expected_filename(experiment))
    assert m, expected_filename(experiment)
    return m.group(1)


def cache_dirs() -> list[Path]:
    """Search order: $PARSEQ_TPU_CACHE, our cache, torch.hub's cache."""
    dirs = []
    if os.environ.get('PARSEQ_TPU_CACHE'):
        dirs.append(Path(os.environ['PARSEQ_TPU_CACHE']))
    home = Path(os.environ.get('XDG_CACHE_HOME') or Path.home() / '.cache')
    dirs.append(home / 'parseq_tpu' / 'checkpoints')
    dirs.append(home / 'torch' / 'hub' / 'checkpoints')
    return dirs


def sha256_prefix_ok(path, prefix: str) -> bool:
    """torch.hub check_hash semantics: sha256 digest starts with `prefix`."""
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest().startswith(prefix)


def find_cached(experiment: str) -> Path | None:
    """Return the verified cached weight file for `experiment`, if any."""
    fname = expected_filename(experiment)
    prefix = expected_hash_prefix(experiment)
    for d in cache_dirs():
        cand = d / fname
        if cand.is_file():
            if sha256_prefix_ok(cand, prefix):
                return cand
            raise PretrainedWeightsError(
                f'{cand} exists but fails its sha256 check (expected prefix '
                f'{prefix}); delete it and re-download')
    return None


def download(experiment: str, dest_dir=None) -> Path:
    """Fetch the released weights (requires network) with checksum verify."""
    import urllib.request

    url = WEIGHTS_URL[experiment]
    dest_dir = Path(dest_dir) if dest_dir else cache_dirs()[-2]
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / expected_filename(experiment)
    tmp = dest.with_suffix('.partial')
    urllib.request.urlretrieve(url, tmp)
    if not sha256_prefix_ok(tmp, expected_hash_prefix(experiment)):
        tmp.unlink()
        raise PretrainedWeightsError(f'downloaded {url} fails its sha256 check')
    os.replace(tmp, dest)
    return dest


def get_pretrained_path(experiment: str, *, download_if_missing: bool = True) -> Path:
    cached = find_cached(experiment)
    if cached is not None:
        return cached
    if download_if_missing:
        try:
            return download(experiment)
        except OSError as e:
            raise PretrainedWeightsError(
                f"Pretrained weights for '{experiment}' are not cached and the "
                f'download failed ({e}). Place {expected_filename(experiment)} '
                f'in one of: {[str(d) for d in cache_dirs()]}') from e
    raise PretrainedWeightsError(
        f"Pretrained weights for '{experiment}' not found in cache "
        f'({[str(d) for d in cache_dirs()]})')


def load_pretrained(experiment: str, *, dtype=None, download_if_missing=True, **kwargs):
    """-> ModelBundle with released weights converted to our layout.

    Composes the *experiment* config (not just the family default) so e.g.
    parseq-tiny gets its 192-dim geometry, then converts the torch
    state_dict (reference create_model(pretrained=True) path,
    strhub/models/utils.py:73-82).
    """
    import jax.numpy as jnp

    from parseq_tpu.utils import config as config_lib
    from parseq_tpu.utils.registry import _bundle
    from parseq_tpu.utils.torch_convert import load_torch_state_dict

    path = get_pretrained_path(experiment, download_if_missing=download_if_missing)
    sd = load_torch_state_dict(str(path))
    full = config_lib.compose(experiment)
    model_cfg = dict(full['model'])
    model_cfg.update(kwargs)
    return _bundle(experiment, model_cfg, dtype=dtype or jnp.bfloat16, torch_sd=sd)
