"""Decompose the eval host data path per-image cost (round 3, VERDICT item 3).

The machine exposes ONE CPU core (nproc=1), so worker scaling cannot raise
the ~1.5k img/s decode ceiling — only cutting per-image host work can.
Stages measured on synthetic word-crop JPEGs at benchmark-typical sizes.
"""

import io
import time

import numpy as np
from PIL import Image

from parseq_tpu.data.transforms import preprocess_pil


def make_jpegs(n=512, size=(100, 32)):
    rng = np.random.default_rng(0)
    bufs = []
    for _ in range(n):
        arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format='JPEG', quality=90)
        bufs.append(b.getvalue())
    return bufs


def t(fn, n, reps=3):
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n / best  # img/s


def main():
    for w, h in [(50, 16), (100, 32), (200, 64)]:
        bufs = make_jpegs(256, (w, h))
        n = len(bufs)

        print(f'--- source {w}x{h} JPEG ---')
        print(f'open only:          {t(lambda: [Image.open(io.BytesIO(b)) for b in bufs], n):8.0f} img/s')
        print(f'open+load(decode):  {t(lambda: [Image.open(io.BytesIO(b)).load() for b in bufs], n):8.0f} img/s')
        print(f'open+convert RGB:   {t(lambda: [Image.open(io.BytesIO(b)).convert("RGB") for b in bufs], n):8.0f} img/s')
        imgs = [Image.open(io.BytesIO(b)).convert('RGB') for b in bufs]
        print(f'resize bicubic:     {t(lambda: [im.resize((128, 32), Image.Resampling.BICUBIC) for im in imgs], n):8.0f} img/s')
        small = [im.resize((128, 32), Image.Resampling.BICUBIC) for im in imgs]
        print(f'np+normalize:       {t(lambda: [((np.asarray(im, dtype=np.float32) / 255.0) - 0.5) / 0.5 for im in small], n):8.0f} img/s')
        print(f'full preprocess:    {t(lambda: [preprocess_pil(Image.open(io.BytesIO(b))) for b in bufs], n):8.0f} img/s')

        # candidate: skip /255 then /0.5 double pass; fuse into one affine
        def fused():
            out = np.empty((n, 32, 128, 3), np.float32)
            for i, b in enumerate(bufs):
                im = Image.open(io.BytesIO(b)).convert('RGB').resize((128, 32), Image.Resampling.BICUBIC)
                np.copyto(out[i], np.asarray(im, np.uint8))
            out *= (2.0 / 255.0)
            out -= 1.0
            return out
        print(f'batch-fused:        {t(fused, n):8.0f} img/s')


if __name__ == '__main__':
    main()


def candidates():
    """Candidate optimizations, measured."""
    for w, h in [(100, 32), (200, 64), (400, 128)]:
        bufs = make_jpegs(256, (w, h))
        n = len(bufs)
        print(f'--- source {w}x{h} ---')

        def full_now():
            return [preprocess_pil(Image.open(io.BytesIO(b))) for b in bufs]
        print(f'current (f32 per-img):        {t(full_now, n):8.0f} img/s')

        def drafted():
            out = []
            for b in bufs:
                im = Image.open(io.BytesIO(b))
                im.draft('RGB', (256, 64))  # decode at DCT-scaled res >= 2x target
                out.append(preprocess_pil(im))
            return out
        print(f'draft>=2x + f32:              {t(drafted, n):8.0f} img/s')

        def uint8_resized():
            out = np.empty((n, 32, 128, 3), np.uint8)
            for i, b in enumerate(bufs):
                im = Image.open(io.BytesIO(b))
                im.draft('RGB', (256, 64))
                im = im.convert('RGB').resize((128, 32), Image.Resampling.BICUBIC)
                out[i] = np.asarray(im)
            return out
        print(f'draft + uint8 batch (no norm):{t(uint8_resized, n):8.0f} img/s')

        # pool overhead on 1 core: ship f32 vs uint8 through IPC
        import multiprocessing as mp
        ctx = mp.get_context('fork')
        global _BUFS
        _BUFS = bufs
        for tag, fn in [('pool f32', _pool_f32), ('pool uint8+draft', _pool_u8)]:
            with ctx.Pool(4) as pool:
                def run(pool=pool, fn=fn):
                    return list(pool.imap(fn, [list(range(i, min(i+64, n))) for i in range(0, n, 64)]))
                print(f'{tag:29s} {t(run, n):8.0f} img/s')


_BUFS = None


def _pool_f32(idxs):
    return np.stack([preprocess_pil(Image.open(io.BytesIO(_BUFS[i]))) for i in idxs])


def _pool_u8(idxs):
    out = np.empty((len(idxs), 32, 128, 3), np.uint8)
    for j, i in enumerate(idxs):
        im = Image.open(io.BytesIO(_BUFS[i]))
        im.draft('RGB', (256, 64))
        im = im.convert('RGB').resize((128, 32), Image.Resampling.BICUBIC)
        out[j] = np.asarray(im)
    return out
