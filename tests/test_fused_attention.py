"""Fused attention kernel vs einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parseq_tpu.ops.attention import _pallas_attention, _reference_attention


@pytest.mark.parametrize('bh,L,dh', [(4, 32, 16), (6, 64, 64), (3, 40, 32)])
def test_kernel_matches_reference(bh, L, dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((bh, L, dh), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((bh, L, dh), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((bh, L, dh), dtype=np.float32))
    scale = 1.0 / np.sqrt(dh)
    want = _reference_attention(q, k, v, scale)
    got = _pallas_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_custom_vjp_grads_match_reference():
    from parseq_tpu.ops import attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 16, 8), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 16, 8), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 16, 8), dtype=np.float32))
    scale = 1.0 / np.sqrt(8)

    # patch the forward to interpret mode so grads flow on CPU
    orig = attention._pallas_attention
    attention.__dict__['_pallas_attention'] = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        def f(q, k, v):
            return jnp.sum(attention.fused_attention(q, k, v, scale) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(attention._reference_attention(q, k, v, scale) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    finally:
        attention.__dict__['_pallas_attention'] = orig


@pytest.mark.parametrize('B,L,h,D', [(4, 32, 4, 64), (3, 40, 2, 32),
                                     (2, 197, 6, 48),    # ViTSTR's odd L
                                     (2, 256, 8, 512)])  # ABINet vision encoder
def test_nosplit_kernel_matches_reference(B, L, h, D):
    from parseq_tpu.ops.attention import _pallas_attention_nosplit, _reference_nosplit

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
    scale = 1.0 / np.sqrt(D // h)
    want = _reference_nosplit(q, k, v, h, scale)
    got = _pallas_attention_nosplit(q, k, v, h, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_nosplit_reference_equals_mha_math():
    """_reference_nosplit must equal layers.mha's attention core."""
    from parseq_tpu.ops import layers
    from parseq_tpu.ops.attention import _reference_nosplit

    rng = np.random.default_rng(3)
    B, L, D, h = 2, 10, 32, 4
    x = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
    p = layers.mha_init(jax.random.key(0), D)
    want = layers.mha(p, x, x, x, num_heads=h)
    q, k, v = (layers.linear(p[n], x) for n in 'qkv')
    got = layers.linear(p['out'], _reference_nosplit(q, k, v, h, 1.0 / np.sqrt(D // h)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_ar_kernel_interpret_parity():
    """Whole-loop AR kernel (interpret mode) matches scan numerics per step.

    Cascade-free comparison: the scan decoder is teacher-forced on the
    *kernel's own* greedy prefix, so both paths see identical inputs at every
    step and logits compare directly. (A raw fused-vs-scan argmax identity is
    not a numerics property under random weights — near-tie greedy picks fork
    the sequence; accuracy equivalence on trained weights is proven at full
    scale in experiments/fused_ar_fullsize.py / PERF.md.)
    """
    import jax
    from parseq_tpu.models import parseq
    from parseq_tpu.models.parseq import _causal_bias
    from parseq_tpu.ops.ar_kernel import ar_decode_fused

    cfg = parseq.PARSeqConfig(num_tokens=13, max_label_length=7, img_size=(32, 64),
                              patch_size=(4, 8), embed_dim=48, enc_num_heads=4,
                              enc_depth=1, dec_num_heads=6, dec_depth=1)
    params = parseq.init(jax.random.key(3), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((4, 32, 64, 3)).astype(np.float32))
    memory = parseq.encode(params, cfg, images)
    got = np.asarray(ar_decode_fused(params, cfg, memory.astype(jnp.bfloat16),
                                     batch_block=2, interpret=True))
    B, n = got.shape[:2]
    assert got.shape == (B, n, cfg.num_classes)

    # teacher-forced scan on the kernel's own prefix: [BOS, tok_0, ..]
    toks = got.argmax(-1).astype(np.int32)
    tgt_in = np.concatenate([np.full((B, 1), cfg.bos_id, np.int32), toks[:, :-1]], 1)
    causal = _causal_bias(n)
    q = jnp.broadcast_to(params['pos_queries'], (B, n, cfg.embed_dim))
    out = parseq.decode(params, cfg, jnp.asarray(tgt_in), memory, query=q,
                        query_bias=causal, content_bias=causal)
    want = np.asarray(parseq.head(params, out))
    np.testing.assert_allclose(got, want, atol=2e-2)
    # greedy picks agree wherever the margin exceeds the bf16 noise floor
    top2 = np.sort(want, -1)[..., -2:]
    confident = (top2[..., 1] - top2[..., 0]) > 0.05
    np.testing.assert_array_equal(got.argmax(-1)[confident],
                                  want.argmax(-1)[confident])
