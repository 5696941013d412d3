"""Native checkpoint I/O.

Single-file msgpack checkpoints (via flax.serialization) holding the param
pytree, the model config, and training metadata. Replaces the reference's
Lightning .ckpt files (SURVEY.md §5 checkpoint/resume); `load_model` also
accepts reference PyTorch .pt/.ckpt files, converting them on the fly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization


def save_checkpoint(path, params, config=None, meta=None):
    """Save params (+ config dataclass/dict, + meta dict) to one msgpack file."""
    payload = {
        'params': jax.tree.map(np.asarray, params),
        'config': json.dumps(_config_dict(config)) if config is not None else '',
        'meta': json.dumps(meta or {}),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + '.tmp')
    with open(tmp, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_checkpoint(path):
    """-> (params, config_dict, meta_dict)."""
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    params = jax.tree.map(jnp.asarray, payload['params'])
    config = json.loads(payload['config']) if payload.get('config') else None
    meta = json.loads(payload.get('meta') or '{}')
    return params, config, meta


def _config_dict(config):
    if dataclasses.is_dataclass(config):
        return dataclasses.asdict(config)
    return dict(config)


def save_topk(out_dir, step, metric_value, params, config=None, meta=None, k=3, mode='max'):
    """ModelCheckpoint-style top-k retention (reference train.py:86-92):
    keep the k best checkpoints by metric, plus 'last.ckpt'."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta = dict(meta or {}, step=int(step), metric=float(metric_value))
    name = f'step={int(step)}-metric={float(metric_value):.4f}.ckpt'
    save_checkpoint(out_dir / name, params, config, meta)
    save_checkpoint(out_dir / 'last.ckpt', params, config, meta)
    # prune
    cands = []
    for p in out_dir.glob('step=*.ckpt'):
        try:
            m = float(p.stem.split('metric=')[1])
        except (IndexError, ValueError):
            continue
        cands.append((m, p))
    cands.sort(key=lambda t: t[0], reverse=(mode == 'max'))
    for _, p in cands[k:]:
        p.unlink()
    # Return the best *surviving* checkpoint: the just-written one may have
    # ranked below the current top-k and been pruned above.
    return cands[0][1] if cands else out_dir / 'last.ckpt'
