"""End-to-end data pipeline: loaders, transforms, augment, metrics, eval."""

import io

import numpy as np
from PIL import Image

from parseq_tpu.data.augment import rand_augment_transform
from parseq_tpu.data.loader import DataLoader
from parseq_tpu.data.module import SceneTextDataModule, get_transform
from parseq_tpu.data.transforms import preprocess_pil
from parseq_tpu.utils.metrics import edit_distance, ned

from .test_lmdb import _png_bytes, make_str_db


def test_edit_distance():
    assert edit_distance('', '') == 0
    assert edit_distance('abc', 'abc') == 0
    assert edit_distance('kitten', 'sitting') == 3
    assert edit_distance('abc', '') == 3
    assert ned('ab', 'abcd') == 0.5
    assert ned('', '') == 0.0


def test_preprocess_semantics():
    """Stretch-to-(H,W) bicubic + [-1,1] normalize (reference module.py:77-81).

    torchvision T.Resize on a PIL input delegates to PIL's bicubic resize and
    ToTensor/Normalize(0.5,0.5) map [0,255] -> [-1,1]; we verify the exact
    value mapping and the non-aspect-preserving stretch.
    """
    # solid color: resize is identity on values, normalize maps exactly
    img = Image.new('RGB', (53, 17), (255, 0, 128))
    got = preprocess_pil(img, (32, 128))
    assert got.shape == (32, 128, 3)
    np.testing.assert_allclose(got[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(got[..., 1], -1.0, atol=1e-6)
    np.testing.assert_allclose(got[..., 2], 128 / 255 * 2 - 1, atol=1e-6)
    # equals PIL bicubic resize exactly (the reference's T.Resize path)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (17, 53, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    ref = np.asarray(img.resize((128, 32), Image.Resampling.BICUBIC), np.float32)
    ref = (ref / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(preprocess_pil(img, (32, 128)), ref, atol=1e-6)
    # grayscale input converts to RGB first
    gray = Image.new('L', (10, 10), 200)
    assert preprocess_pil(gray, (32, 128)).shape == (32, 128, 3)


def test_dataloader_shapes_and_padding(tmp_path):
    db = tmp_path / 'ds'
    make_str_db(db, [(_png_bytes(), f'w{i}') for i in range(10)])
    from parseq_tpu.data.dataset import LmdbDataset

    ds = LmdbDataset(str(db), 'abcdefghijklmnopqrstuvwxyz0123456789', 25,
                     transform=get_transform((32, 128)))
    loader = DataLoader(ds, batch_size=4)
    batches = list(loader)
    assert len(batches) == 3
    imgs, labels, valid = batches[-1]
    assert imgs.shape == (4, 32, 128, 3)
    assert imgs.dtype == np.float32
    assert valid.tolist() == [True, True, False, False]
    assert len(labels) == 2


def test_dataloader_workers(tmp_path):
    db = tmp_path / 'ds'
    make_str_db(db, [(_png_bytes(color=(i * 20, 0, 0)), f'w{i}') for i in range(9)])
    from parseq_tpu.data.dataset import LmdbDataset

    ds = LmdbDataset(str(db), 'abcdefghijklmnopqrstuvwxyz0123456789', 25,
                     transform=get_transform((32, 128)))
    got_serial = [l for _, ls, _ in DataLoader(ds, 2) for l in ls]
    got_pool = [l for _, ls, _ in DataLoader(ds, 2, num_workers=2) for l in ls]
    assert got_serial == got_pool == [f'w{i}' for i in range(9)]


def test_dataloader_shuffle_determinism(tmp_path):
    db = tmp_path / 'ds'
    make_str_db(db, [(_png_bytes(), f'w{i}') for i in range(16)])
    from parseq_tpu.data.dataset import LmdbDataset

    ds = LmdbDataset(str(db), 'abcdefghijklmnopqrstuvwxyz0123456789', 25,
                     transform=get_transform((32, 128)))
    l1 = DataLoader(ds, 4, shuffle=True, seed=1, epoch=0)
    l2 = DataLoader(ds, 4, shuffle=True, seed=1, epoch=0)
    a = [l for _, ls, _ in l1 for l in ls]
    b = [l for _, ls, _ in l2 for l in ls]
    assert a == b
    l2.set_epoch(1)
    c = [l for _, ls, _ in l2 for l in ls]
    assert a != c  # different epoch -> different order


def test_rand_augment_produces_valid_images():
    np.random.seed(0)
    import random

    random.seed(0)
    aug = rand_augment_transform()
    img = Image.fromarray(np.random.default_rng(0).integers(0, 256, (32, 100, 3), dtype=np.uint8))
    for _ in range(25):
        out = aug(img)
        assert out.mode == 'RGB'
        assert min(out.size) > 0


def test_datamodule_test_loaders(tmp_path):
    root = tmp_path / 'data'
    for name in ('IIIT5k', 'CUTE80'):
        make_str_db(root / 'test' / name, [(_png_bytes(), 'abc'), (_png_bytes(), 'de')])
    dm = SceneTextDataModule(str(root), 'real', (32, 128), 25,
                             charset_train='abcdefghijklmnopqrstuvwxyz',
                             charset_test='abcdefghijklmnopqrstuvwxyz',
                             batch_size=2, num_workers=0)
    loaders = dm.test_dataloaders(('IIIT5k', 'CUTE80'))
    assert set(loaders) == {'IIIT5k', 'CUTE80'}
    imgs, labels, valid = next(iter(loaders['IIIT5k']))
    assert imgs.shape == (2, 32, 128, 3)
    assert labels == ['abc', 'de']


def test_read_cli_on_demo_images(tmp_path):
    """End-to-end read CLI on the real demo images (fresh tiny model)."""
    import subprocess
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    from parseq_tpu.utils.checkpoint import save_checkpoint
    from parseq_tpu.utils.registry import create_model

    demo = sorted(str(p) for p in Path('/root/reference/demo_images').glob('*'))[:2]
    if not demo:
        import pytest

        pytest.skip('demo images unavailable')
    m = create_model('parseq-tiny', dtype=jnp.float32, enc_depth=1, embed_dim=48,
                     enc_num_heads=3, dec_num_heads=6, max_label_length=5)
    ckpt = tmp_path / 'tiny.ckpt'
    save_checkpoint(ckpt, m.params, m.cfg,
                    meta={'name': 'parseq-tiny', 'model_config': m.raw_config})
    r = subprocess.run(
        [sys.executable, '-m', 'parseq_tpu.cli.read', str(ckpt), '--images', *demo],
        capture_output=True, text=True, cwd=Path(__file__).resolve().parents[1],
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'},
        # during TPU-relay outages sitecustomize's backend registration can
        # hang any fresh interpreter; fail visibly instead of hanging CI
        timeout=900,
    )
    assert r.returncode == 0, r.stderr
    for p in demo:
        assert p in r.stdout


def test_preprocess_jax_serving_path():
    """Device-side preprocess: uint8 -> [-1,1], resize to (H, W)."""
    import jax.numpy as jnp

    from parseq_tpu.data.transforms import preprocess_jax

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 17, 53, 3), dtype=np.uint8)
    out = preprocess_jax(imgs, (32, 128))
    assert out.shape == (2, 32, 128, 3)
    assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001
    # solid-gray image maps to ~0 everywhere
    gray = np.full((1, 10, 10, 3), 127.5, np.float32) / 255.0
    out2 = preprocess_jax(gray * 255.0 if False else np.full((1, 10, 10, 3), 0.5, np.float32), (32, 128))
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-2)


def test_augment_op_inventory_matches_reference():
    """Op registry parity with reference augment.py:78-98: the sampled set is
    the increasing set minus SharpnessIncreasing plus GaussianBlur and
    PoissonNoise; MotionBlur and GaussianNoise are registered but (like the
    reference, which comments them out of _RAND_TRANSFORMS) not sampled."""
    from parseq_tpu.data import augment

    increasing = [
        'AutoContrast', 'Equalize', 'Invert', 'Rotate', 'PosterizeIncreasing',
        'SolarizeIncreasing', 'SolarizeAdd', 'ColorIncreasing',
        'ContrastIncreasing', 'BrightnessIncreasing', 'SharpnessIncreasing',
        'ShearX', 'ShearY', 'TranslateXRel', 'TranslateYRel',
    ]
    want_sampled = [n for n in increasing if n != 'SharpnessIncreasing']
    want_sampled += ['GaussianBlur', 'PoissonNoise']
    assert sorted(augment.DEFAULT_TRANSFORM_NAMES) == sorted(want_sampled)
    for name in want_sampled + ['MotionBlur', 'GaussianNoise']:
        assert callable(augment.NAME_TO_OP[name]), name


def test_motion_blur_smears_along_a_line():
    import random

    from parseq_tpu.data.augment import motion_blur

    random.seed(3)
    np.random.seed(3)
    # single bright pixel: after motion blur, energy spreads but is conserved
    arr = np.zeros((31, 61, 3), np.uint8)
    arr[15, 30] = 255
    out = np.asarray(motion_blur(Image.fromarray(arr), 10), np.float32)
    assert (out > 0).sum() > 3 * 3  # spread beyond the original pixel
    assert out.max() < 255  # energy was distributed, not copied
    # output stays a valid RGB image of the same size
    assert out.shape == arr.shape


def test_pool_workers_have_distinct_rng_streams(tmp_path):
    """Forked workers must not inherit identical RNG state (ADVICE.md):
    each (seed, epoch, worker) gets its own stream."""
    from parseq_tpu.data.loader import DataLoader

    class NoiseDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            # worker-global RNG: identical worker states would yield
            # identical values for items fetched by different workers
            return np.full((2, 2, 3), np.random.random(), np.float32), f'w{i}'

    ds = NoiseDataset()
    vals_e0 = [float(img[0, 0, 0, 0]) for img, _, _ in DataLoader(ds, 1, num_workers=4, epoch=0)]
    assert len(set(vals_e0)) == len(vals_e0), 'duplicate RNG draws across workers'
    vals_e1 = [float(img[0, 0, 0, 0]) for img, _, _ in DataLoader(ds, 1, num_workers=4, epoch=1)]
    assert set(vals_e0).isdisjoint(vals_e1), 'epoch RNG streams repeat'


def test_u8_eval_path_bit_identical():
    """uint8 transport + device normalize must equal the f32 host path to
    <= 1 ulp for non-drafted sources (XLA fuses the normalize into an FMA,
    so the last bit can differ; 255 uint8 levels map 1:1 regardless)."""
    import io

    import jax.numpy as jnp

    from parseq_tpu.data.transforms import preprocess_pil, preprocess_pil_u8
    from parseq_tpu.train.evaluate import _normalize_u8

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (40, 90, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')  # PNG: draft is a no-op

    f32 = preprocess_pil(Image.open(io.BytesIO(buf.getvalue())))
    u8 = preprocess_pil_u8(Image.open(io.BytesIO(buf.getvalue())))
    assert u8.dtype == np.uint8 and u8.shape == (32, 128, 3)
    dev = np.asarray(_normalize_u8(jnp.asarray(u8[None])))[0]
    np.testing.assert_allclose(dev, f32, atol=1.3e-7)  # 1 ulp at |x|<=1


def test_native_jpeg_decode_parity():
    """Native decode+resize (data/native/jpeg_decode.cpp) is bit-identical
    to the PIL path (open + draft + convert('RGB') + BICUBIC resize) on
    RGB and grayscale JPEGs across sizes spanning the DCT-scaled-decode
    thresholds; non-JPEG bytes return None (PIL fallback); the bytes-mode
    transform routes through it."""
    import io

    from parseq_tpu.data.native import jpeg_decode_resize, load_jpeg
    from parseq_tpu.data.transforms import preprocess_pil_u8

    if load_jpeg() is None:
        import pytest

        pytest.skip('native JPEG decoder unavailable (no toolchain/libjpeg)')

    rng = np.random.default_rng(3)
    for w, h, mode in [(90, 28, 'RGB'), (100, 32, 'L'), (257, 65, 'RGB'),
                       (256, 64, 'RGB'), (520, 130, 'L'), (1030, 260, 'RGB')]:
        arr = rng.integers(0, 256, (h, w) if mode == 'L' else (h, w, 3),
                           dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, 'JPEG', quality=85)
        data = buf.getvalue()
        native = jpeg_decode_resize(data, (32, 128))
        assert native is not None and native.shape == (32, 128, 3)
        ref = preprocess_pil_u8(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(native, ref)

    # non-JPEG -> None
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (20, 40, 3), dtype=np.uint8)).save(buf, 'PNG')
    assert jpeg_decode_resize(buf.getvalue(), (32, 128)) is None

    # bytes-mode transform: JPEG through native, PNG through PIL fallback
    t = get_transform((32, 128), u8=True)
    assert getattr(t, 'accepts_bytes', False)
    out = t(data)
    np.testing.assert_array_equal(out, ref)
    png_out = t(buf.getvalue())
    assert png_out.shape == (32, 128, 3) and png_out.dtype == np.uint8


def test_u8_loader_and_eval_dataset(tmp_path):
    """test_dataloaders default to uint8 batches; eval_dataset normalizes on
    device and scores identically to an f32 loader."""
    root = tmp_path / 'data'
    for name in ('IIIT5k',):
        make_str_db(root / 'test' / name, [(_png_bytes(), 'abc'), (_png_bytes(), 'de')])
    dm = SceneTextDataModule(str(root), 'real', (32, 128), 25,
                             charset_train='abcdefghijklmnopqrstuvwxyz',
                             charset_test='abcdefghijklmnopqrstuvwxyz',
                             batch_size=2, num_workers=0)
    u8_loader = dm.test_dataloaders(('IIIT5k',))['IIIT5k']
    imgs, labels, valid = next(iter(u8_loader))
    assert imgs.dtype == np.uint8

    f32_loader = dm.test_dataloaders(('IIIT5k',), u8=False)['IIIT5k']
    imgs32, _, _ = next(iter(f32_loader))
    assert imgs32.dtype == np.float32

    from parseq_tpu.train.evaluate import eval_dataset
    from parseq_tpu.utils.registry import create_model

    import jax.numpy as jnp

    m = create_model('parseq-tiny', dtype=jnp.float32, enc_depth=1, embed_dim=48,
                     enc_num_heads=3, dec_num_heads=6, max_label_length=5,
                     charset_train='abcdefghijklmnopqrstuvwxyz',
                     charset_test='abcdefghijklmnopqrstuvwxyz')
    r_u8 = eval_dataset(m, u8_loader, 'u8')
    r_f32 = eval_dataset(m, f32_loader, 'f32')
    assert r_u8.num_samples == r_f32.num_samples == 2
    assert r_u8.accuracy == r_f32.accuracy
    # the 1-ulp input skew (FMA-fused normalize) propagates to confidence
    np.testing.assert_allclose(r_u8.confidence, r_f32.confidence, rtol=1e-5)


def test_train_transform_u8_native_parity():
    """The TRAINING transform (augment on, u8=True — the train_dataset
    default) produces values identical to the f32 path after device
    normalize: native full-res decode is bit-equal to PIL's, augment sees
    the same RGB image, and (x/255-.5)/.5 on u8 equals the host f32 math."""
    import random

    import jax.numpy as jnp

    from parseq_tpu.data.native import jpeg_decode, load_jpeg
    from parseq_tpu.train.evaluate import _normalize_u8

    rng = np.random.default_rng(7)
    datas = []
    for w, h, mode in [(90, 28, 'RGB'), (120, 40, 'L')]:
        arr = rng.integers(0, 256, (h, w) if mode == 'L' else (h, w, 3),
                           dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, 'JPEG', quality=85)
        datas.append(buf.getvalue())
    datas.append(_png_bytes())  # PIL-fallback route

    if load_jpeg() is not None:
        pil = np.asarray(Image.open(io.BytesIO(datas[0])).convert('RGB'))
        np.testing.assert_array_equal(jpeg_decode(datas[0]), pil)
        gray = np.asarray(Image.open(io.BytesIO(datas[1])).convert('RGB'))
        np.testing.assert_array_equal(jpeg_decode(datas[1]), gray)
        assert jpeg_decode(datas[2]) is None  # PNG -> fallback

    t_u8 = get_transform((32, 128), augment=True, u8=True)
    t_f32 = get_transform((32, 128), augment=True)
    for data in datas:
        random.seed(11); np.random.seed(11)
        out_u8 = t_u8(data)
        random.seed(11); np.random.seed(11)
        out_f32 = t_f32(data)
        assert out_u8.dtype == np.uint8
        dev = np.asarray(_normalize_u8(jnp.asarray(out_u8[None])))[0]
        np.testing.assert_allclose(dev, out_f32, atol=1.3e-7)  # 1 ulp


def test_poisson_lut_distribution():
    """The LUT Poisson sampler (augment.poisson_noise) matches the exact
    Poisson distribution: mean/variance within sampling error and total
    variation distance <= ~2^-16 by construction."""
    from parseq_tpu.data.augment import _poisson_lut

    for lam in (1, 5, 20):
        lut = _poisson_lut(lam)
        # exact pmf for comparison
        p = np.exp(-float(lam))
        pmf = [p]
        for k in range(1, len(np.unique(lut)) + 32):
            p *= lam / k
            pmf.append(p)
        pmf = np.asarray(pmf)
        counts = np.bincount(lut, minlength=len(pmf)) / 65536.0
        m = min(len(counts), len(pmf))
        tv = 0.5 * np.abs(counts[:m] - pmf[:m]).sum()
        assert tv < 3e-4, (lam, tv)
        # sampled moments
        np.random.seed(0)
        s = lut[np.random.randint(0, 65536, 200_000, np.uint16)]
        assert abs(s.mean() - lam) < 0.05 * lam + 0.05
        assert abs(s.var() - lam) < 0.08 * lam + 0.1
