"""Multi-host SPMD training: 2 JAX processes x 2 virtual CPU devices.

Validates the reference's DDP semantics (train.py:65-71) on our SPMD stack:
per-host sharded loading, global-array assembly via
jax.make_array_from_process_local_data, replicated state, and rank-0-only
checkpoint/metric writes — on real separate processes joined through the
JAX coordination service on localhost.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

from .test_lmdb import make_str_db
from .test_train_loop import _text_image

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    root = tmp_path / 'data'
    words = ['cat', 'dog', 'bird', 'fish', 'ab', 'xyz', 'hello', 'world']
    make_str_db(root / 'train' / 'real' / 'syn',
                [(_text_image(w), w) for w in words * 4])
    make_str_db(root / 'val' / 'syn', [(_text_image(w), w) for w in words])

    port = _free_port()
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / 'tests' / '_multihost_worker.py'),
             str(rank), str(port), str(root), str(tmp_path / 'work')],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out[-3000:]}'
        assert f'MULTIHOST_OK rank={rank} step=2' in out, out[-2000:]

    # rank 0 wrote artifacts; metrics contain finite losses and a val row
    metrics = [json.loads(l) for l in open(tmp_path / 'work' / 'metrics.jsonl')]
    assert any('loss' in m for m in metrics)
    assert any('val_accuracy' in m for m in metrics)
    assert (tmp_path / 'work' / 'checkpoints' / 'last.ckpt').exists()
    # rank 1 printed a best path only if it is main — it must not be
    assert 'best=None' in outs[1] or 'MULTIHOST_OK rank=1' in outs[1]
