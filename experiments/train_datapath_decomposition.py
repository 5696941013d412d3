"""Decompose the TRAINING host data path (round 4, VERDICT item 1).

The eval path got a native decoder + u8 transport in round 3; the training
path (full PIL decode -> RandAugment -> PIL resize -> f32 normalize -> f32
IPC) was never measured against the 98.1 ms / 3,915 img/s device step.
This measures each host stage per-image on synthetic word-crop JPEGs at
MJSynth-typical sizes, then candidate pipelines, on the 1-core host.

Budget framing: at bs=384 the device step is ~98 ms, so the host must
sustain >= 3,915 img/s of decode+augment+resize+collate for the step to be
device-bound. Stages that can't reach that on one core cap the loader-fed
rate; this table shows exactly which.

Run: python experiments/train_datapath_decomposition.py
"""

import io
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parseq_tpu.data.augment import rand_augment_transform
from parseq_tpu.data.transforms import preprocess_pil, preprocess_pil_u8


def make_jpegs(n=384, size=(100, 32)):
    """Word-crop-like JPEGs: smooth background + random rectangles so decode
    cost is realistic (pure noise inflates JPEG entropy ~2x vs text crops)."""
    rng = np.random.default_rng(0)
    bufs = []
    w, h = size
    for _ in range(n):
        arr = np.full((h, w, 3), rng.integers(100, 200), np.uint8)
        for _ in range(8):  # "characters"
            x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
            arr[y0:y0 + rng.integers(4, h - y0 - 3),
                x0:x0 + rng.integers(4, min(12, w - x0))] = rng.integers(0, 255)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format='JPEG', quality=90)
        bufs.append(b.getvalue())
    return bufs


def rate(fn, n, reps=5):
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n / best


def stage_table(size=(100, 32)):
    bufs = make_jpegs(384, size)
    n = len(bufs)
    aug = rand_augment_transform()
    # fixed seeds per run so augment op mix is comparable across variants
    print(f'=== source {size[0]}x{size[1]} JPEG, n={n}, target 32x128 ===')

    def decode_pil():
        return [Image.open(io.BytesIO(b)).convert('RGB') for b in bufs]
    print(f'decode (PIL full-res):         {rate(decode_pil, n):8.0f} img/s')

    from parseq_tpu.data.native import jpeg_decode
    if jpeg_decode(bufs[0]) is not None:
        def decode_native():
            return [jpeg_decode(b) for b in bufs]
        print(f'decode (native full-res):      {rate(decode_native, n):8.0f} img/s')
        arrs = [jpeg_decode(b) for b in bufs]
        def wrap():
            return [Image.fromarray(a) for a in arrs]
        print(f'  + Image.fromarray wrap:      {rate(wrap, n):8.0f} img/s')
    else:
        print('decode (native full-res):      unavailable')

    imgs = decode_pil()

    def augment_only():
        import random
        random.seed(0); np.random.seed(0)
        return [aug(im) for im in imgs]
    print(f'RandAugment (3 layers, p=0.5): {rate(augment_only, n):8.0f} img/s')
    auged = augment_only()

    def resize_f32():
        return [preprocess_pil(im) for im in auged]
    print(f'resize+normalize f32 (PIL):    {rate(resize_f32, n):8.0f} img/s')

    def resize_u8():
        return [preprocess_pil_u8(im, fast_decode=False) for im in auged]
    print(f'resize -> u8 (PIL, no norm):   {rate(resize_u8, n):8.0f} img/s')

    from parseq_tpu.data.native import bicubic_resize_u8
    a0 = np.asarray(auged[0].convert('RGB'))
    if bicubic_resize_u8(a0, (32, 128)) is not None:
        def resize_native():
            return [bicubic_resize_u8(np.asarray(im.convert('RGB')), (32, 128))
                    for im in auged]
        print(f'resize -> u8 (native bicubic): {rate(resize_native, n):8.0f} img/s')

    # --- full per-image pipelines (what the transform actually does) -------
    def full_now():  # round-3 training transform: PIL decode->aug->f32
        import random
        random.seed(0); np.random.seed(0)
        out = []
        for b in bufs:
            im = Image.open(io.BytesIO(b)).convert('RGB')
            out.append(preprocess_pil(aug(im)))
        return out
    print(f'FULL current (f32):            {rate(full_now, n):8.0f} img/s')

    def full_u8():  # candidate: same but u8 out (device-side normalize)
        import random
        random.seed(0); np.random.seed(0)
        out = []
        for b in bufs:
            im = Image.open(io.BytesIO(b)).convert('RGB')
            out.append(preprocess_pil_u8(aug(im), fast_decode=False))
        return out
    print(f'FULL u8 transport (PIL):       {rate(full_u8, n):8.0f} img/s')

    if jpeg_decode(bufs[0]) is not None:
        def full_native_u8():  # candidate: native decode + u8 out
            import random
            random.seed(0); np.random.seed(0)
            out = []
            for b in bufs:
                arr = jpeg_decode(b)
                im = Image.fromarray(arr) if arr is not None else \
                    Image.open(io.BytesIO(b)).convert('RGB')
                out.append(preprocess_pil_u8(aug(im), fast_decode=False))
            return out
        print(f'FULL native decode + u8:       {rate(full_native_u8, n):8.0f} img/s')

    def full_noaug_u8():  # augment-off bound (val/BN-reestimate path)
        return [preprocess_pil_u8(Image.open(io.BytesIO(b))) for b in bufs]
    print(f'FULL no-aug u8 (PIL):          {rate(full_noaug_u8, n):8.0f} img/s')

    from parseq_tpu.data.native import jpeg_decode_resize
    if jpeg_decode_resize(bufs[0]) is not None:
        def full_noaug_native():
            return [jpeg_decode_resize(b) for b in bufs]
        print(f'FULL no-aug native:            {rate(full_noaug_native, n):8.0f} img/s')

    # --- IPC: ship one collated batch through a fork-pool round trip -------
    import multiprocessing as mp
    ctx = mp.get_context('fork')
    f32_batch = np.zeros((n, 32, 128, 3), np.float32)
    u8_batch = np.zeros((n, 32, 128, 3), np.uint8)
    with ctx.Pool(1) as pool:
        for tag, payload in [('f32', f32_batch), ('u8 ', u8_batch)]:
            def roundtrip(payload=payload, pool=pool):
                return pool.apply(_echo, (payload,))
            print(f'pool IPC roundtrip {tag} batch:  {rate(roundtrip, n):8.0f} img/s '
                  f'({payload.nbytes / 1e6:.1f} MB)')


def _echo(x):
    return x


def per_op_cost(size=(100, 32)):
    """Per-augment-op cost: which of the 16 sampled ops dominate."""
    import random
    from parseq_tpu.data import augment as A
    bufs = make_jpegs(128, size)
    imgs = [Image.open(io.BytesIO(b)).convert('RGB') for b in bufs]
    n = len(imgs)
    print(f'--- per-op cost at {size[0]}x{size[1]} (magnitude 5) ---')
    for name in A.DEFAULT_TRANSFORM_NAMES:
        op = A.NAME_TO_OP[name]
        random.seed(0); np.random.seed(0)
        r = rate(lambda op=op: [op(im, 5.0) for im in imgs], n)
        print(f'{name:22s} {r:8.0f} img/s')


if __name__ == '__main__':
    per_op_cost()
    for size in [(100, 32), (200, 64)]:
        stage_table(size)
