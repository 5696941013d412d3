"""Image preprocessing matching the reference transform pipeline.

Reference (/root/reference/strhub/data/module.py:68-82):
  [RandAugment] -> [rotate] -> Resize((H, W), bicubic, NOT aspect-preserving)
  -> ToTensor -> Normalize(mean=0.5, std=0.5)

Host side uses PIL (decode + bicubic resize parity with torchvision); output
is NHWC float32 in [-1, 1], the TPU-native layout. A jit-compiled JAX variant
(`preprocess_jax`) covers serving paths where images arrive as arrays.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def preprocess_pil(img: Image.Image, img_size=(32, 128), rotation: int = 0) -> np.ndarray:
    """PIL image -> (H, W, 3) float32 in [-1, 1]."""
    if img.mode != 'RGB':
        img = img.convert('RGB')
    if rotation:
        img = img.rotate(rotation, expand=True)
    h, w = img_size
    img = img.resize((w, h), Image.Resampling.BICUBIC)
    x = np.asarray(img, dtype=np.float32) / 255.0
    return (x - 0.5) / 0.5


def preprocess_pil_u8(img: Image.Image, img_size=(32, 128), rotation: int = 0,
                      fast_decode: bool = True) -> np.ndarray:
    """PIL image -> (H, W, 3) uint8, resized; normalization deferred to device.

    Eval-path variant (this host has few cores; see PERF.md "Host-side eval
    path"): returns uint8 so worker->main IPC and host->device transfer move
    4x fewer bytes, and the (x/255 - 0.5)/0.5 normalize runs on the TPU with
    the exact same op order (bit-identical to the f32 host path).

    ``fast_decode`` engages libjpeg's DCT-scaled decode (PIL ``draft``): for
    JPEG sources >= 2x the target in both dims the decoder emits a 1/2- (or
    1/4-, 1/8-) scale image nearly free; the bicubic resize then runs from
    that. No-op for PNG and for benchmark-typical small crops (measured:
    zero pixel delta below the 2x threshold, +40-80% decode rate above it).
    Skipped under rotation (rotate acts on the decoded image).
    """
    h, w = img_size
    if fast_decode and not rotation:
        img.draft('RGB', (w, h))  # no-op unless JPEG and source >= 2x target
    if img.mode != 'RGB':
        img = img.convert('RGB')
    if rotation:
        img = img.rotate(rotation, expand=True)
    img = img.resize((w, h), Image.Resampling.BICUBIC)
    return np.asarray(img, dtype=np.uint8)


def load_image(path, img_size=(32, 128), rotation: int = 0) -> np.ndarray:
    with Image.open(path) as img:
        return preprocess_pil(img, img_size, rotation)


def batch_images(paths, img_size=(32, 128), rotation: int = 0) -> np.ndarray:
    return np.stack([load_image(p, img_size, rotation) for p in paths])


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _resize_normalize(x, h, w):
    y = jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method='cubic')
    # PIL's bicubic clamps to the uint8 range before ToTensor; match it so
    # cubic overshoot can't leave [-1, 1].
    y = jnp.clip(y, 0.0, 1.0)
    return (y - 0.5) / 0.5


def preprocess_jax(images, img_size=(32, 128)):
    """Device-side preprocessing for serving: uint8/float NHWC -> [-1, 1].

    Note: jax.image cubic resize is not bit-identical to PIL's bicubic
    (different boundary handling); use the PIL path when exact parity with
    reference predictions matters.
    """
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    h, w = img_size
    return _resize_normalize(x, h, w)
