#!/usr/bin/env python
"""Loader-fed sustained training throughput at PARSeq-S bs=384 (round 4,
VERDICT item 1).

The 98.1 ms / 3,915 img/s training headline was device-only; this measures
the number a user actually gets: the PRODUCTION train() loop fed by the real
DataLoader (LMDB -> native JPEG decode -> RandAugment -> u8 resize -> pool
IPC -> H2D -> jitted step), on the real chip, with augment on.

Three numbers bound the system:
  loader-only   host pipeline rate, no device work (per-core rate at
                num_workers=0; pool rate at the production num_workers)
  step-only     device rate on a repeated resident batch (no host work)
  loader-fed    the production train() loop, sustained over ~100 steps

On a 1-core host loader-only < step-only, so loader-fed ~= loader-only
(prefetch overlaps host and device). The table reports cores needed for
device-bound training: ceil(step_rate / per_core_host_rate).

Dataset: synthetic word-crop JPEGs at MJSynth-typical size (~100x32,
quality 90) packed into a real LMDB, so decode cost is representative
(MJSynth is JPEG; reference dataset.py:143 decodes via PIL).

Run: python experiments/train_e2e_loader_fed.py [--steps 120]
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
from PIL import Image

CHARSET_94 = None  # filled from parseq_tpu.data.charset at runtime


def make_train_lmdb(root, n=8192, seed=0):
    """Word-crop JPEGs (smooth bg + glyph-like rectangles; pure noise would
    inflate JPEG entropy ~2x vs real text crops)."""
    from parseq_tpu.data.lmdb import LmdbWriter

    rng = np.random.default_rng(seed)
    vocab = [''.join(rng.choice(list('abcdefghijklmnopqrstuvwxyz0123456789'),
                                int(rng.integers(2, 8)))) for _ in range(256)]
    path = os.path.join(root, 'train', 'real', 'syn')
    with LmdbWriter(path) as w:
        w.put(b'num-samples', str(n).encode())
        for i in range(1, n + 1):
            wpx, hpx = int(rng.integers(60, 160)), int(rng.integers(24, 48))
            arr = np.full((hpx, wpx, 3), rng.integers(100, 200), np.uint8)
            for _ in range(8):
                x0, y0 = rng.integers(0, wpx - 8), rng.integers(0, hpx - 8)
                arr[y0:y0 + rng.integers(4, hpx - y0 - 3),
                    x0:x0 + rng.integers(4, min(12, wpx - x0))] = rng.integers(0, 255)
            b = io.BytesIO()
            Image.fromarray(arr).save(b, format='JPEG', quality=90)
            w.put(f'image-{i:09d}'.encode(), b.getvalue())
            w.put(f'label-{i:09d}'.encode(),
                  vocab[int(rng.integers(len(vocab)))].encode())
    return path


def build_dm(root, batch_size, num_workers, augment=True):
    from parseq_tpu.data.charset import CHARSET_36, CHARSET_94
    from parseq_tpu.data.module import SceneTextDataModule

    return SceneTextDataModule(
        root, 'real', (32, 128), 25, charset_train=CHARSET_94,
        charset_test=CHARSET_36, batch_size=batch_size,
        num_workers=num_workers, augment=augment)


def loader_rate(dm, n_batches=20, label=''):
    loader = dm.train_dataloader()
    it = iter(loader)
    imgs, labels, valid = next(it)  # warm the pool/transform
    t0 = time.perf_counter()
    count = 0
    for bi, (imgs, labels, valid) in enumerate(it):
        count += imgs.shape[0]
        if bi + 1 >= n_batches:
            break
    dt = time.perf_counter() - t0
    r = count / dt
    print(f'loader-only {label:24s} {r:8.0f} img/s '
          f'(dtype={imgs.dtype}, {count} imgs in {dt:.1f}s)')
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/train_e2e_loader_fed')
    ap.add_argument('--steps', type=int, default=120)
    ap.add_argument('--batch_size', type=int, default=384)
    ap.add_argument('--skip_build', action='store_true')
    args = ap.parse_args()

    data_root = os.path.join(args.root, 'data')
    if not args.skip_build:
        t0 = time.time()
        make_train_lmdb(data_root)
        print(f'built synthetic train LMDB in {time.time() - t0:.1f}s')

    # --- loader-only rates --------------------------------------------------
    per_core = loader_rate(build_dm(data_root, args.batch_size, 0),
                           label='num_workers=0 (per-core)')
    pool2 = loader_rate(build_dm(data_root, args.batch_size, 2),
                        label='num_workers=2 (pool)')

    # --- step-only rate: production step on one resident batch --------------
    import jax
    import jax.numpy as jnp

    from parseq_tpu.data.charset import CHARSET_36, CHARSET_94
    from parseq_tpu.train import optim
    from parseq_tpu.train.families import get_family
    from parseq_tpu.train.steps import make_train_step
    from parseq_tpu.utils.registry import create_model

    bundle = create_model('parseq', seed=0, dtype=jnp.bfloat16,
                          charset_train=CHARSET_94, charset_test=CHARSET_36,
                          max_label_length=25, img_size=[32, 128])
    cfg, tok = bundle.cfg, bundle.tokenizer
    family = get_family('parseq')
    tree0 = bundle.params if (isinstance(bundle.params, dict)
                              and 'stats' in bundle.params) else {
        'params': bundle.params, 'stats': {}}
    ocfg = optim.OptimConfig(lr=7e-4, weight_decay=0.0, warmup_pct=0.075,
                             batch_size=args.batch_size, grad_clip=20.0,
                             total_steps=1000, num_devices=1, accum=1, swa=False)
    tx, _ = optim.make_optimizer(ocfg, tree0['params'])
    step_fn = jax.jit(make_train_step(family, cfg, tx, jnp.bfloat16,
                                      microbatches=4), donate_argnums=(0,))
    state = {'params': tree0['params'], 'stats': tree0['stats'],
             'opt_state': tx.init(tree0['params']),
             'step': jnp.zeros((), jnp.int32)}
    base_rng = jax.random.key(0, impl='unsafe_rbg')
    perm_rng = np.random.default_rng(0)

    dm0 = build_dm(data_root, args.batch_size, 0)
    images, labels, valid = next(iter(dm0.train_dataloader()))
    batch = {'images': jnp.asarray(images)}
    batch.update({k: jnp.asarray(v)
                  for k, v in family.prepare(tok, labels, cfg, perm_rng).items()})
    state, m = step_fn(state, batch, base_rng)  # compile
    float(m['loss'])  # force: block_until_ready does not sync under the relay
    # Steps chain through the donated state, so N dispatches serialize on
    # device; one scalar fetch forces the whole chain (the trusted pattern —
    # see experiments/_timing.py; constants amortize over N).
    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, mm = step_fn(state, batch, base_rng)
        float(mm['loss'])
        return time.perf_counter() - t0

    chain(2)
    t_short, t_long = chain(5), chain(25)
    dev_dt = (t_long - t_short) / 20  # slope: dispatch/RTT constants cancel
    dev_rate = args.batch_size / dev_dt
    print(f'step-only (device, slope-timed):    {dev_rate:8.0f} img/s '
          f'({dev_dt * 1e3:.1f} ms/step)')

    # --- loader-fed: production loop, host feeding the device ---------------
    # Identical step/jit as above; iterate the real loader, overlap host and
    # device (prefetch thread + pool at nw=2; fully serial at nw=0).
    fed = {}
    for nw in (2, 0):
        dm = build_dm(data_root, args.batch_size, nw)
        loader = dm.train_dataloader()
        warm, timed = 5, args.steps
        count = 0
        it = iter(loader)
        epoch = 0
        t0 = None
        done = 0
        while done < warm + timed:
            try:
                images, labels, valid = next(it)
            except StopIteration:
                epoch += 1
                loader.set_epoch(epoch)
                it = iter(loader)
                continue
            batch = {'images': jnp.asarray(images)}
            batch.update({k: jnp.asarray(v)
                          for k, v in family.prepare(tok, labels, cfg, perm_rng).items()})
            state, m = step_fn(state, batch, base_rng)
            done += 1
            if done == warm:
                float(m['loss'])
                t0 = time.perf_counter()
            elif done > warm:
                count += args.batch_size
        float(m['loss'])
        dt = time.perf_counter() - t0
        fed[nw] = count / dt
        print(f'loader-fed (production, nw={nw}):     {fed[nw]:8.0f} img/s '
              f'({dt / timed * 1e3:.1f} ms/step over {timed} steps)')
    need = int(np.ceil(dev_rate / per_core))
    print(json.dumps({
        'per_core_host_img_s': round(per_core),
        'pool2_host_img_s': round(pool2),
        'device_step_img_s': round(dev_rate),
        'loader_fed_img_s': round(max(fed.values())),
        'loader_fed_nw0_img_s': round(fed[0]),
        'host_cores_for_device_bound': need,
    }))


if __name__ == '__main__':
    main()
