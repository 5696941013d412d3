"""ViTSTR parity vs torch twin + loss sanity."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from parseq_tpu.models import vitstr
from parseq_tpu.utils.torch_convert import convert_vitstr

from .torch_twin import TwinViTSTR

CFG = vitstr.ViTSTRConfig(
    num_tokens=13, max_label_length=6, img_size=(32, 32), patch_size=(8, 8),
    embed_dim=32, num_heads=4, depth=2,
)


def test_vitstr_parity():
    torch.manual_seed(3)
    twin = TwinViTSTR(num_tokens=CFG.num_tokens, max_label_length=CFG.max_label_length,
                      img_size=CFG.img_size, patch_size=CFG.patch_size,
                      d=CFG.embed_dim, heads=CFG.num_heads, depth=CFG.depth).eval()
    params = convert_vitstr(dict(twin.state_dict()))
    images = np.random.default_rng(0).standard_normal((2, 3, *CFG.img_size), dtype=np.float32)
    want = twin(torch.from_numpy(images)).numpy()
    got = np.asarray(vitstr.forward(params, CFG, jnp.asarray(images.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape == (2, CFG.max_label_length + 1, CFG.num_classes)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vitstr_loss_decreases():
    from parseq_tpu.data import Tokenizer

    import optax

    tok = Tokenizer('0123456789')
    params = vitstr.init(jax.random.key(0), CFG)
    images = np.random.default_rng(0).standard_normal((4, *CFG.img_size, 3)).astype(np.float32)
    tgt = jnp.asarray(tok.encode(['12', '345', '6789', '0'], CFG.max_label_length))

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: vitstr.logits_loss(p, CFG, jnp.asarray(images), tgt)[1:], has_aux=True
        )(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_vitstr_registry():
    from parseq_tpu.utils.registry import create_model

    m = create_model('vitstr', dtype=jnp.float32, img_size=[32, 32], patch_size=[8, 8],
                     depth=2, embed_dim=32, num_heads=4, max_label_length=6)
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    labels, conf = m.read(imgs)
    assert len(labels) == 2


def test_patchify_conv_equals_row_accum():
    """The large-patch conv patchify (patch_dim >= 192 gate in
    vit.patch_embed) must match the row-accumulation path bit-for-bit in
    semantics (same flattened-patch matmul, f32)."""
    from parseq_tpu.models import vit

    cfg = vit.ViTConfig(img_size=(32, 64), patch_size=(16, 16), embed_dim=48)
    assert 16 * 16 * 3 >= 192  # conv gate engaged for this config
    p = vit.init(jax.random.key(0), cfg)['patch_embed']
    img = jax.random.normal(jax.random.key(1), (3, 32, 64, 3), jnp.float32)
    got = vit.patch_embed(p, img, cfg)

    B, H, W, C = img.shape
    ph, pw = cfg.patch_size
    gh, gw = H // ph, W // pw
    # ground truth: explicit (ph, pw, C)-ordered patch flatten + matmul
    ref = img.reshape(B, gh, ph, gw, pw, C).transpose(0, 1, 3, 2, 4, 5)
    ref = ref.reshape(B, gh * gw, ph * pw * C) @ p['w'] + p['b']
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_patchify_conv_equals_row_accum_bf16():
    """Both gate branches must round identically in bf16: f32 accumulation
    (preferred_element_type), cast to input dtype, then bias add — so the
    conv path (patch_dim >= 192) and the row path are interchangeable under
    mixed precision, not just f32 (advisor round-4 low finding)."""
    from parseq_tpu.models import vit

    conv_cfg = vit.ViTConfig(img_size=(32, 64), patch_size=(16, 16), embed_dim=48)
    p = vit.init(jax.random.key(0), conv_cfg)['patch_embed']
    img = jax.random.normal(jax.random.key(1), (3, 32, 64, 3), jnp.float32)
    img = img.astype(jnp.bfloat16)

    got = vit.patch_embed(p, img, conv_cfg)
    assert got.dtype == jnp.bfloat16

    # Row-accumulation ground truth at the same geometry (gate forced off by
    # replicating its math directly: f32-accumulated per-row einsum, cast,
    # then bias add in bf16 — vit.patch_embed's small-patch branch).
    B, H, W, C = img.shape
    ph, pw = conv_cfg.patch_size
    gh, gw = H // ph, W // pw
    k = pw * C
    x = img.reshape(B, gh, ph, gw, k)
    w = p['w'].astype(img.dtype).reshape(ph, k, conv_cfg.embed_dim)
    ref = jnp.zeros((B, gh, gw, conv_cfg.embed_dim), jnp.float32)
    for r in range(ph):
        ref = ref + jnp.einsum('bgwk,kd->bgwd', x[:, :, r], w[r],
                               preferred_element_type=jnp.float32)
    ref = ref.astype(img.dtype) + p['b'].astype(img.dtype)
    ref = ref.reshape(B, gh * gw, conv_cfg.embed_dim)
    # Same accumulation dtype and same cast/bias order -> tight bf16 match.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)
