"""Worker process for the 2-process multi-host SPMD test.

Usage: python _multihost_worker.py RANK PORT DATA_ROOT WORK_DIR

Each process exposes 2 virtual CPU devices (4 global), joins the JAX
coordination service, and runs a tiny PARSeq training via the real train
loop — exercising sharded loading, make_array_from_process_local_data
assembly, replicated state, multi-host validation, and rank-0-only writes.
"""

import os
import re
import sys

# Force exactly 2 local devices, overriding any inherited count (the pytest
# parent sets 8 via conftest and the env is inherited by subprocesses).
flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '',
               os.environ.get('XLA_FLAGS', ''))
os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=2'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')


def main():
    rank, port, data_root, work_dir = sys.argv[1:5]
    rank = int(rank)
    jax.distributed.initialize(f'localhost:{port}', num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.devices()
    assert jax.local_device_count() == 2

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    import jax.numpy as jnp

    from parseq_tpu.train.loop import train

    config = {
        'model': {
            'name': 'parseq', 'img_size': [16, 32], 'patch_size': [4, 8],
            'max_label_length': 7,
            'charset_train': 'abcdefghijklmnopqrstuvwxyz',
            'charset_test': 'abcdefghijklmnopqrstuvwxyz',
            'batch_size': 8, 'lr': 3e-4, 'weight_decay': 0.0, 'warmup_pct': 0.2,
            'embed_dim': 32, 'enc_num_heads': 2, 'enc_mlp_ratio': 2, 'enc_depth': 1,
            'dec_num_heads': 4, 'dec_mlp_ratio': 2, 'dec_depth': 1,
            'perm_num': 6, 'perm_forward': True, 'perm_mirrored': True,
            'dropout': 0.0, 'decode_ar': False, 'refine_iters': 0,
        },
        'data': {'root_dir': data_root, 'train_dir': 'real', 'num_workers': 0,
                 'augment': False, 'batch_size': 8},
        'trainer': {'max_epochs': 1, 'val_check_interval': 10,
                    'gradient_clip_val': 20, 'devices': 4, 'swa': False},
    }
    state, best = train(config, work_dir, compute_dtype=jnp.float32, max_steps=2)
    loss_ok = bool(jnp.isfinite(jnp.asarray(state['step'])))
    print(f'MULTIHOST_OK rank={rank} step={int(state["step"])} '
          f'best={best} finite={loss_ok}', flush=True)


if __name__ == '__main__':
    main()
