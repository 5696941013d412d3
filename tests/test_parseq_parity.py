"""Full-model parity: our JAX PARSeq vs an independent torch twin.

Converting the twin's (reference-schema) state_dict through
utils.torch_convert must reproduce encoder outputs, decoder outputs, and all
three inference modes (AR / NAR / refine) to float32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from parseq_tpu.models import parseq
from parseq_tpu.utils.torch_convert import convert_parseq

from .torch_twin import TwinPARSeq

# Small config to keep CPU tests fast but architecturally complete
# (dec_depth=2 exercises the content-stream update path).
CFG = parseq.PARSeqConfig(
    num_tokens=13,  # 10 chars + 3 specials
    max_label_length=7,
    img_size=(32, 64),
    patch_size=(4, 8),
    embed_dim=48,
    enc_num_heads=4,
    enc_mlp_ratio=4.0,
    enc_depth=3,
    dec_num_heads=6,
    dec_mlp_ratio=4.0,
    dec_depth=2,
)


@pytest.fixture(scope='module')
def twin_and_params():
    torch.manual_seed(7)
    twin = TwinPARSeq(
        num_tokens=CFG.num_tokens, max_label_length=CFG.max_label_length,
        img_size=CFG.img_size, patch_size=CFG.patch_size, d=CFG.embed_dim,
        enc_heads=CFG.enc_num_heads, enc_mlp=4, enc_depth=CFG.enc_depth,
        dec_heads=CFG.dec_num_heads, dec_mlp=4, dec_depth=CFG.dec_depth,
    ).eval()
    params = convert_parseq({k: v for k, v in twin.state_dict().items()})
    return twin, params


@pytest.fixture(scope='module')
def images():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 3, *CFG.img_size), dtype=np.float32)


def test_encoder_parity(twin_and_params, images):
    twin, params = twin_and_params
    with torch.no_grad():
        want = twin.encoder(torch.from_numpy(images)).numpy()
    got = np.asarray(parseq.encode(params, CFG, jnp.asarray(images.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decode_with_masks_parity(twin_and_params, images):
    twin, params = twin_and_params
    B, n = images.shape[0], CFG.num_steps
    rng = np.random.default_rng(1)
    tgt = rng.integers(0, CFG.num_tokens - 2, size=(B, n)).astype(np.int64)
    tgt[:, 0] = CFG.bos_id
    causal = np.triu(np.ones((n, n), bool), 1)
    pad_mask = np.zeros((B, n), bool)
    pad_mask[0, -2:] = True
    with torch.no_grad():
        memory_t = twin.encoder(torch.from_numpy(images))
        out_t = twin.decode(torch.from_numpy(tgt), memory_t,
                            torch.from_numpy(causal), torch.from_numpy(pad_mask))
        want = twin.head(out_t).numpy()
    memory = parseq.encode(params, CFG, jnp.asarray(images.transpose(0, 2, 3, 1)))
    from parseq_tpu.ops.layers import bool_to_bias

    out = parseq.decode(params, CFG, jnp.asarray(tgt.astype(np.int32)), memory,
                        content_bias=bool_to_bias(jnp.asarray(causal)),
                        padding_mask=jnp.asarray(pad_mask))
    got = np.asarray(parseq.head(params, out))
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize('mode', ['nar', 'ar', 'ar_refine'])
def test_inference_parity(twin_and_params, images, mode):
    twin, params = twin_and_params
    decode_ar = mode != 'nar'
    refine_iters = 2 if mode == 'ar_refine' else 0
    with torch.no_grad():
        want = twin(torch.from_numpy(images), decode_ar=decode_ar, refine_iters=refine_iters).numpy()
    cfg = parseq.PARSeqConfig(**{**CFG.__dict__, 'decode_ar': decode_ar, 'refine_iters': refine_iters})
    got = np.asarray(parseq.forward(params, cfg, jnp.asarray(images.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape == (2, CFG.num_steps, CFG.num_classes)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # Greedy token decisions must agree exactly.
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_perm_masks_match_reference_algorithm():
    """Vectorized mask builder vs the reference's explicit loop (system.py:153-167)."""
    rng = np.random.default_rng(3)
    for L in [3, 5, 9, 27]:
        perm = np.concatenate([[0], rng.permutation(L - 2) + 1, [L - 1]])
        # reference algorithm, re-derived with numpy
        mask = np.zeros((L, L), bool)
        for i in range(L):
            mask[perm[i], perm[i + 1 :]] = True
        ref_content = mask[:-1, :-1].copy()
        mask[np.eye(L, dtype=bool)] = True
        ref_query = mask[1:, :-1]
        cb, qb = parseq.perm_attn_masks(jnp.asarray(perm))
        np.testing.assert_array_equal(np.asarray(cb) < 0, ref_content)
        np.testing.assert_array_equal(np.asarray(qb) < 0, ref_query)


def test_gen_tgt_perms_properties():
    cfg = CFG
    rng = np.random.default_rng(0)
    perms = parseq.gen_tgt_perms(rng, cfg)
    K = cfg.perm_num
    L = cfg.max_label_length + 2
    assert perms.shape == (K, L)
    # BOS always first; EOS decoded last for every perm except the reverse
    # ramp (row 1), which decodes EOS first with null context (system.py:149-150)
    assert (perms[:, 0] == 0).all()
    assert (np.delete(perms[:, -1], 1) == L - 1).all()
    # First perm is the forward ordering
    np.testing.assert_array_equal(perms[0], np.arange(L))
    # Second perm is the strict reverse ramp (incl. null-context EOS)
    np.testing.assert_array_equal(perms[1, 1:], L - 1 - np.arange(L - 1))
    # Each row is a permutation of 0..L-1
    for p in perms:
        assert sorted(p.tolist()) == list(range(L))
    # Mirrored pairs: rows 2k+1 reverse the char-part of rows 2k (k>=1)
    for k in range(1, K // 2):
        np.testing.assert_array_equal(perms[2 * k + 1, 1:-1], perms[2 * k, 1:-1][::-1])


def test_multi_perm_loss_runs_and_is_finite(twin_and_params, images):
    _, params = twin_and_params
    from parseq_tpu.data import Tokenizer

    tok = Tokenizer('0123456789')
    tgt = tok.encode(['123', '4567890'], CFG.max_label_length)
    rng = np.random.default_rng(0)
    perms = parseq.gen_tgt_perms(rng, CFG)
    loss, numel = parseq.multi_perm_loss(
        params, CFG, jnp.asarray(images.transpose(0, 2, 3, 1)), jnp.asarray(tgt), jnp.asarray(perms)
    )
    assert np.isfinite(float(loss))
    # numel: chars+EOS counted for 2 perms, chars only for the rest
    chars = 3 + 7
    want = (chars + 2) * 2 + chars * (CFG.perm_num - 2)
    assert int(numel) == want


def test_shared_perm_dropout_semantics():
    """shared_perm_dropout=True draws ONE mask per dropout site for all K
    perms. With two identical perm rows the per-perm loss terms are then
    identical, so the K=2 mean equals the K=1 loss exactly; independent
    per-perm masks (the reference's sequential decode calls) break that
    equality. Without dropout rng both paths are identical."""
    import dataclasses

    import jax

    from parseq_tpu.data import Tokenizer

    base = parseq.PARSeqConfig(num_tokens=13, max_label_length=5, img_size=(16, 32),
                               embed_dim=32, enc_num_heads=2, enc_depth=1,
                               dec_num_heads=4)
    tok = Tokenizer('0123456789')
    params = parseq.init(jax.random.key(0), base)
    rng = np.random.default_rng(0)
    images_l = jnp.asarray(rng.standard_normal((4, 16, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(tok.encode(['12', '345', '0987', '6'], 5))
    fwd_perm = np.arange(base.max_label_length + 2)
    dup = jnp.asarray(np.stack([fwd_perm, fwd_perm]))
    single = dup[:1]
    key = jax.random.key(7)

    shared = dataclasses.replace(base, shared_perm_dropout=True)
    perperm = dataclasses.replace(base, shared_perm_dropout=False)

    l_dup, _ = parseq.multi_perm_loss(params, shared, images_l, tgt, dup, rng=key)
    l_one, _ = parseq.multi_perm_loss(params, shared, images_l, tgt, single, rng=key)
    np.testing.assert_allclose(float(l_dup), float(l_one), rtol=1e-6)

    l_ind, _ = parseq.multi_perm_loss(params, perperm, images_l, tgt, dup, rng=key)
    assert abs(float(l_ind) - float(l_one)) > 1e-4  # independent masks differ

    # No dropout rng: both paths bit-identical.
    a, _ = parseq.multi_perm_loss(params, shared, images_l, tgt, dup)
    b, _ = parseq.multi_perm_loss(params, perperm, images_l, tgt, dup)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bulk_dropout_bits():
    """bulk_dropout_bits draws all K perms' masks in one RngBitGenerator
    call per site (dropout_site_shapes order) instead of K per-perm calls
    under the vmap. Checks with dropout ON: finite loss/grads for BOTH the
    bulk and the keyed (bulk_dropout_bits=False) path at dec_depth 1 and 2,
    per-perm mask independence under bulk bits (duplicating a perm changes
    the mean loss — it would be a no-op with shared masks), and that the
    two paths agree when dropout is the only difference they could show."""
    import dataclasses

    import jax

    for depth in (1, 2):
        bulk = parseq.PARSeqConfig(num_tokens=13, max_label_length=5,
                                   img_size=(16, 32), embed_dim=32,
                                   enc_num_heads=2, enc_depth=1,
                                   dec_num_heads=4, dec_depth=depth,
                                   bulk_dropout_bits=True)
        keyed = dataclasses.replace(bulk, bulk_dropout_bits=False)
        u8 = dataclasses.replace(bulk, bulk_bits_uint8=True)
        nprng = np.random.default_rng(0)
        params = parseq.init(jax.random.key(0), bulk)
        im = jax.random.uniform(jax.random.key(3), (4, 16, 32, 3), jnp.float32)
        tgt = jnp.asarray(nprng.integers(0, 12, (4, 7)), jnp.int32)
        perms = jnp.asarray(parseq.gen_tgt_perms(nprng, bulk))
        key = jax.random.key(7)

        for cfg in (bulk, keyed, u8):  # keyed + uint8 paths stay covered with dropout on
            lb, numel = parseq.multi_perm_loss(params, cfg, im, tgt, perms, rng=key)
            assert np.isfinite(float(lb))
            g = jax.grad(lambda p: parseq.multi_perm_loss(
                p, cfg, im, tgt, perms, rng=key)[0])(params)
            assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))

        # Mask independence per perm under bulk bits: an identical perm
        # duplicated at indices 0 and 1 (same validity rule for both) gets
        # DIFFERENT masks, so the 2-perm mean loss differs from the 1-perm
        # loss. Shared masks would make them equal (see the shared_perm test).
        fwd = jnp.asarray(np.arange(bulk.max_label_length + 2))[None]
        dup = jnp.concatenate([fwd, fwd], axis=0)
        l_dup, _ = parseq.multi_perm_loss(params, bulk, im, tgt, dup, rng=key)
        l_one, _ = parseq.multi_perm_loss(params, bulk, im, tgt, fwd, rng=key)
        assert abs(float(l_dup) - float(l_one)) > 1e-4

        # dropout off: bulk and keyed configs take the identical branch
        a, _ = parseq.multi_perm_loss(
            params, dataclasses.replace(keyed, dropout=0.0), im, tgt, perms, rng=key)
        b, _ = parseq.multi_perm_loss(
            params, dataclasses.replace(bulk, dropout=0.0), im, tgt, perms, rng=key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # site inventory: [embed, query] + 6 per stream, content stream
        # skipped on the last layer
        n_sites = len(parseq.dropout_site_shapes(bulk, 4, 6, 32))
        assert n_sites == 2 + 6 * (2 * depth - 1)


def test_dropout_empirical_rate():
    """The uint16 threshold dropout drops at cfg.dropout empirically, both
    from a PRNG key and from pregenerated bulk bits (the two rng forms
    ops.layers.dropout accepts), and survivors are scaled by 1/keep."""
    import jax

    from parseq_tpu.ops.layers import dropout

    rate = 0.1
    x = jnp.ones((64, 64, 16), jnp.float32)
    key = jax.random.key(11)
    n = x.size

    for rng in (key, jax.random.bits(key, x.shape, jnp.uint16)):
        y = np.asarray(dropout(x, rate, rng))
        dropped = float((y == 0.0).sum()) / n
        # binomial std at n=65536, p=0.1 is ~0.0012; 5 sigma
        assert abs(dropped - rate) < 6e-3, dropped
        kept = y[y != 0.0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)


def test_ar_early_exit_matches_scan(twin_and_params, images):
    """while_loop early-exit AR decode decodes the same strings as full scan."""
    import jax

    _, params = twin_and_params
    from parseq_tpu.data import Tokenizer

    memory = parseq.encode(params, CFG, jnp.asarray(images.transpose(0, 2, 3, 1)))
    full = parseq.ar_decode(params, CFG, memory)
    early = jax.jit(lambda m: parseq.ar_decode(params, CFG, m, early_exit=True))(memory)
    tok = Tokenizer('0123456789')
    import numpy as np

    p_full, c_full = tok.decode(np.asarray(jax.nn.softmax(full, -1)))
    p_early, c_early = tok.decode(np.asarray(jax.nn.softmax(early, -1)))
    assert p_full == p_early
    for a, b in zip(c_full, c_early):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_ar_kvcache_matches_scan(images):
    """KV-cached AR decode (dec_depth=1) must match the generic scan decode."""
    import jax
    import torch

    from .torch_twin import TwinPARSeq

    cfg1 = parseq.PARSeqConfig(**{**CFG.__dict__, 'dec_depth': 1})
    torch.manual_seed(9)
    twin = TwinPARSeq(
        num_tokens=cfg1.num_tokens, max_label_length=cfg1.max_label_length,
        img_size=cfg1.img_size, patch_size=cfg1.patch_size, d=cfg1.embed_dim,
        enc_heads=cfg1.enc_num_heads, enc_mlp=4, enc_depth=cfg1.enc_depth,
        dec_heads=cfg1.dec_num_heads, dec_mlp=4, dec_depth=1,
    ).eval()
    params = convert_parseq(dict(twin.state_dict()))
    memory = parseq.encode(params, cfg1, jnp.asarray(images.transpose(0, 2, 3, 1)))
    want = parseq.ar_decode(params, cfg1, memory)
    got = parseq.ar_decode_kvcache(params, cfg1, memory)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    got_early = jax.jit(
        lambda m: parseq.ar_decode_kvcache(params, cfg1, m, early_exit=True))(memory)
    from parseq_tpu.data import Tokenizer

    tok = Tokenizer('0123456789')
    p1, _ = tok.decode(np.asarray(jax.nn.softmax(want, -1)))
    p2, _ = tok.decode(np.asarray(jax.nn.softmax(got_early, -1)))
    assert p1 == p2


def test_multi_perm_loss_decreases_under_training():
    """Gradient flow end-to-end: overfitting 4 samples must cut the loss
    roughly in half within 60 adam steps."""
    import jax
    import optax

    from parseq_tpu.data import Tokenizer

    cfg = parseq.PARSeqConfig(num_tokens=13, max_label_length=5, img_size=(16, 32),
                              embed_dim=32, enc_num_heads=2, enc_depth=1,
                              dec_num_heads=4)
    tok = Tokenizer('0123456789')
    params = parseq.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    images_l = jnp.asarray(rng.standard_normal((4, 16, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(tok.encode(['12', '345', '0987', '6'], 5))
    perms = jnp.asarray(parseq.gen_tgt_perms(rng, cfg))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, r):
        (loss, _), g = jax.value_and_grad(
            lambda p: parseq.multi_perm_loss(p, cfg, images_l, tgt, perms, rng=r),
            has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    key = jax.random.key(0)
    losses = []
    for i in range(60):
        params, opt, loss = step(params, opt, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < 0.65 * losses[0], losses[::10]


@pytest.mark.slow
def test_full_size_twin_parity():
    """Converter parity at the *released* PARSeq-S geometry (384-dim,
    12-layer encoder, 94-charset -> 97 tokens, 26 decode steps), so weight
    conversion is certified at real scale, not just toy shapes
    (reference configs/model/parseq.yaml + configs/charset/94_full.yaml)."""
    cfg = parseq.PARSeqConfig(
        num_tokens=97, max_label_length=25, img_size=(32, 128),
        patch_size=(4, 8), embed_dim=384, enc_num_heads=6, enc_depth=12,
        dec_num_heads=12, dec_depth=1, decode_ar=True, refine_iters=1,
    )
    torch.manual_seed(11)
    twin = TwinPARSeq(
        num_tokens=cfg.num_tokens, max_label_length=cfg.max_label_length,
        img_size=cfg.img_size, patch_size=cfg.patch_size, d=cfg.embed_dim,
        enc_heads=cfg.enc_num_heads, enc_mlp=4, enc_depth=cfg.enc_depth,
        dec_heads=cfg.dec_num_heads, dec_mlp=4, dec_depth=cfg.dec_depth,
    ).eval()
    params = convert_parseq(dict(twin.state_dict()))

    rng = np.random.default_rng(3)
    images = rng.standard_normal((2, 3, *cfg.img_size), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(images), decode_ar=True, refine_iters=1).numpy()
    got = np.asarray(parseq.forward(params, cfg, jnp.asarray(images.transpose(0, 2, 3, 1))))
    # output shape [B, 26, 95] (25+EOS positions x 94 chars + EOS),
    # reference README.md:111-112
    assert got.shape == want.shape == (2, 26, 95)
    # greedy decisions must agree exactly at full depth/width
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=5e-3)
