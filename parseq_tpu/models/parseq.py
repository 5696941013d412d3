"""PARSeq: Permuted Autoregressive Sequence model, TPU-first.

Re-design of the reference PARSeq (/root/reference/strhub/models/parseq/
model.py:31-169, modules.py:27-126, system.py:90-200) as pure functions with
static shapes:

  * AR decoding is a `lax.scan` over ``max_label_length + 1`` steps (the
    reference's Python loop + early break, model.py:124-145, becomes a
    fixed-trip scan; predictions are identical because the tokenizer
    truncates at the first EOS either way).
  * Permutation attention masks are built vectorized from the inverse
    permutation (one comparison matrix) instead of the reference's Python
    O(L^2) loop (system.py:153-167), and the multi-permutation training
    loss vmaps the decoder over the permutation axis.
  * Everything is mask-driven; no data-dependent shapes anywhere.

Two-stream decoder layer (XLNet-style, pre-LN) semantics match
modules.py:27-98: query stream attends over the content stream; content
stream is updated by every layer except the last.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from parseq_tpu.ops import layers
from parseq_tpu.ops.layers import NEG_INF, dropout, layer_norm, linear, mha
from parseq_tpu.models import vit
from parseq_tpu.models.vit import ViTConfig


@dataclass(frozen=True)
class PARSeqConfig:
    num_tokens: int = 97  # len(charset) + 3 specials (EOS/BOS/PAD)
    max_label_length: int = 25
    img_size: tuple[int, int] = (32, 128)
    patch_size: tuple[int, int] = (4, 8)
    embed_dim: int = 384
    enc_num_heads: int = 6
    enc_mlp_ratio: float = 4.0
    enc_depth: int = 12
    dec_num_heads: int = 12
    dec_mlp_ratio: float = 4.0
    dec_depth: int = 1
    decode_ar: bool = True
    refine_iters: int = 1
    dropout: float = 0.1
    remat: bool = False  # encoder rematerialization (training)
    # One dropout-mask draw per site, shared by all K permutations, instead
    # of K independent draws (the reference's sequential decode calls each
    # draw fresh masks, system.py:181-186). The expected per-perm loss and
    # gradient are identical and it saves 0.73 ms of the 3.29 ms
    # decoder+head+loss piece at bs=96 (slope-timed, rbg keys; PERF.md
    # round-3 decoder table) — but the cross-perm mask correlation
    # measurably hurts convergence: a 3-seed A/B at PARSeq-Ti scale
    # (experiments/convergence_tpu.py, 1200 steps) gave
    # shared 50.8/85.5/91.8% vs independent 55.9/87.9/94.9% val accuracy,
    # independent winning every seed with consistently lower train loss.
    # Default False = reference semantics; the flag stays as a documented
    # measured-rejected lever (PERF.md).
    shared_perm_dropout: bool = False
    # Draw all K perms' dropout bits in ONE RngBitGenerator call per site
    # outside the vmap instead of K per-perm calls inside it (which lower
    # to serialized per-lane RNG ops). Identical independent-per-perm mask
    # semantics — only the bit values differ from the keyed path. See
    # dropout_site_shapes / PERF.md round-3 decoder table. Measured on-chip
    # (experiments/bulk_dropout_step_ab.py, slope-timed full production
    # step): 98.1 vs 101.5 ms at bs=384 m=4 — default on.
    bulk_dropout_bits: bool = True
    # Bulk bits as uint8 instead of uint16: half the bits HBM traffic,
    # 1.56 ms/step recovered at bs=384 (experiments/dropout_fusion_levers.py).
    # The drop probability quantizes to round(p*256)/256 (0.1 -> 0.1016)
    # with the survivor scale using the quantized keep rate, so inverted
    # dropout stays exactly unbiased; rates below 1/512 fall back to uint16
    # (see multi_perm_loss). Default ON since round 5: the full-workflow e2e
    # with the lever genuinely engaged scored 98.57% combined — top of the
    # task's historical spread (PERF.md round-5 e2e section).
    bulk_bits_uint8: bool = True

    # Training-time permutation settings (system.py:81-85)
    perm_num: int = 6
    perm_forward: bool = True
    perm_mirrored: bool = True

    @property
    def vit(self) -> ViTConfig:
        return ViTConfig(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.enc_depth,
            num_heads=self.enc_num_heads,
            mlp_ratio=self.enc_mlp_ratio,
            remat=self.remat,
        )

    @property
    def num_steps(self) -> int:
        return self.max_label_length + 1  # +1 for EOS

    @property
    def num_classes(self) -> int:
        return self.num_tokens - 2  # BOS and PAD are never predicted

    # Token ids (fixed layout, data/tokenizer.py)
    @property
    def eos_id(self) -> int:
        return 0

    @property
    def bos_id(self) -> int:
        return self.num_tokens - 2

    @property
    def pad_id(self) -> int:
        return self.num_tokens - 1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _decoder_layer_init(key, cfg: PARSeqConfig):
    d = cfg.embed_dim
    dff = int(d * cfg.dec_mlp_ratio)
    ks = layers.split_rngs(key, ['self_attn', 'cross_attn', 'linear1', 'linear2'])
    return {
        'self_attn': layers.mha_init(ks['self_attn'], d),
        'cross_attn': layers.mha_init(ks['cross_attn'], d),
        'linear1': layers.linear_init(ks['linear1'], d, dff),
        'linear2': layers.linear_init(ks['linear2'], dff, d),
        'norm1': layers.layer_norm_init(d),
        'norm2': layers.layer_norm_init(d),
        'norm_q': layers.layer_norm_init(d),
        'norm_c': layers.layer_norm_init(d),
    }


def init(key, cfg: PARSeqConfig):
    ks = layers.split_rngs(key, ['encoder', 'decoder', 'head', 'text_embed', 'pos_queries'])
    dec_keys = jax.random.split(ks['decoder'], cfg.dec_depth)
    return {
        'encoder': vit.init(ks['encoder'], cfg.vit),
        'decoder': {
            'layers': [_decoder_layer_init(k, cfg) for k in dec_keys],
            'norm': layers.layer_norm_init(cfg.embed_dim),
        },
        'head': layers.linear_init(ks['head'], cfg.embed_dim, cfg.num_classes),
        'text_embed': layers.embedding_init(ks['text_embed'], cfg.num_tokens, cfg.embed_dim),
        'pos_queries': layers.trunc_normal(ks['pos_queries'], (1, cfg.num_steps, cfg.embed_dim), 0.02),
    }


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _forward_stream(p, tgt, tgt_norm, tgt_kv, memory, bias, key_padding_mask, *, nhead, drop, rngs):
    """One stream of the two-stream layer (modules.py:55-79)."""
    sa = mha(p['self_attn'], tgt_norm, tgt_kv, tgt_kv, num_heads=nhead,
             attn_bias=bias, key_padding_mask=key_padding_mask,
             dropout_rate=drop, rng=rngs[0])
    tgt = tgt + dropout(sa, drop, rngs[1])
    ca = mha(p['cross_attn'], layer_norm(p['norm1'], tgt), memory, memory,
             num_heads=nhead, dropout_rate=drop, rng=rngs[2])
    tgt = tgt + dropout(ca, drop, rngs[3])
    h = layers.gelu(linear(p['linear1'], layer_norm(p['norm2'], tgt)))
    h = linear(p['linear2'], dropout(h, drop, rngs[4]))
    return tgt + dropout(h, drop, rngs[5])


def _rng_list(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def decoder_apply(p, query, content, memory, *, query_bias=None, content_bias=None,
                  padding_mask=None, nhead, drop=0.0, rng=None):
    """Stack of two-stream layers; content updated by all but the last layer
    (modules.py:119-123). Final LayerNorm on the query stream.

    `rng`: a PRNG key (split into per-site keys), or a flat list of
    pregenerated per-site uint16 bits arrays in `dropout_site_shapes`
    order (bulk-bits mode; the last layer's content stream has no sites)."""
    n_layers = len(p['layers'])
    bulk = isinstance(rng, (list, tuple))
    if bulk:
        cur = list(rng)
    else:
        rngs = _rng_list(rng, n_layers * 12)
    for i, lp in enumerate(p['layers']):
        last = i == n_layers - 1
        if bulk:
            r_q, cur = cur[:6], cur[6:]
            r_c = [None] * 6
            if not last:
                r_c, cur = cur[:6], cur[6:]
        else:
            r = rngs[i * 12 : (i + 1) * 12]
            r_q, r_c = r[:6], r[6:]
        query_norm = layer_norm(lp['norm_q'], query)
        content_norm = layer_norm(lp['norm_c'], content)
        query = _forward_stream(lp, query, query_norm, content_norm, memory,
                                query_bias, padding_mask, nhead=nhead, drop=drop, rngs=r_q)
        if not last:
            content = _forward_stream(lp, content, content_norm, content_norm, memory,
                                      content_bias, padding_mask, nhead=nhead, drop=drop, rngs=r_c)
    return layer_norm(p['norm'], query)


def embed_context(params, cfg: PARSeqConfig, tgt_ids, dtype, *, drop=0.0, rng=None):
    """Context (content-stream) embeddings for token ids (model.py:94-99).

    BOS (position 0) is the null context and carries no positional info;
    tokens after it get pos_queries[k-1] added. Token embeddings are scaled
    by sqrt(embed_dim) (modules.py:168-176).
    """
    scale = math.sqrt(cfg.embed_dim)
    emb = scale * layers.embedding(params['text_embed'], tgt_ids, dtype)
    L = tgt_ids.shape[1]
    pos = params['pos_queries'][:, : L - 1].astype(dtype)
    emb = emb.at[:, 1:].add(pos) if L > 1 else emb
    return dropout(emb, drop, rng)


def decode(params, cfg: PARSeqConfig, tgt_ids, memory, *, query=None, query_bias=None,
           content_bias=None, padding_mask=None, dtype=jnp.float32, drop=0.0, rng=None):
    """model.py:86-103: embed context, default query = pos_queries, run decoder.

    `rng`: a PRNG key, or a flat list of pregenerated per-site uint16 bits
    arrays in `dropout_site_shapes` order (bulk-bits mode)."""
    if isinstance(rng, (list, tuple)):
        r0, r1, rest = rng[0], rng[1], list(rng[2:])
    else:
        r = _rng_list(rng, 3)
        r0, r1, rest = r[0], r[1], r[2]
    content = embed_context(params, cfg, tgt_ids, dtype, drop=drop, rng=r0)
    if query is None:
        B, L = tgt_ids.shape
        query = jnp.broadcast_to(params['pos_queries'][:, :L].astype(dtype), (B, L, cfg.embed_dim))
    query = dropout(query, drop, rng=r1)
    return decoder_apply(params['decoder'], query, content, memory,
                         query_bias=query_bias, content_bias=content_bias,
                         padding_mask=padding_mask, nhead=cfg.dec_num_heads,
                         drop=drop, rng=rest)


def head(params, x):
    return linear(params['head'], x)


def dropout_site_shapes(cfg: PARSeqConfig, B, L, T):
    """Ordered shapes of every dropout site one decode() call consumes in
    bulk-bits mode: [context embed, query] then per layer the query
    stream's 6 sites (self-attn probs, self out, cross probs, cross out,
    MLP hidden, MLP out), plus the content stream's 6 for every non-last
    layer (the last layer never updates content, modules.py:119-123)."""
    h, D = cfg.dec_num_heads, cfg.embed_dim
    dff = int(D * cfg.dec_mlp_ratio)

    def stream():
        return [(B, h, L, L), (B, L, D), (B, h, L, T), (B, L, D),
                (B, L, dff), (B, L, D)]

    shapes = [(B, L, D), (B, L, D)]
    for i in range(cfg.dec_depth):
        shapes += stream()
        if i != cfg.dec_depth - 1:
            shapes += stream()
    return shapes


def encode(params, cfg: PARSeqConfig, images):
    return vit.apply(params['encoder'], images, cfg.vit)


# ---------------------------------------------------------------------------
# Inference (model.py:105-169)
# ---------------------------------------------------------------------------


def _causal_bias(n, dtype=jnp.float32):
    """Forward-AR bias: query i may see keys <= i (triu(1) masked)."""
    r = jnp.arange(n)
    return jnp.where(r[None, :] > r[:, None], NEG_INF, 0.0).astype(dtype)


def ar_decode(params, cfg: PARSeqConfig, memory, dtype=jnp.float32, early_exit=False):
    """Greedy left-to-right AR decode (model.py:119-147).

    Fixed-shape device loop; the content buffer holds [BOS, tok_1, ...] and
    each step queries one position with keys limited to the prefix.

    early_exit=True reproduces the reference's test-time batch early exit
    (model.py:144-145: stop once every row has emitted an EOS) as a
    lax.while_loop — on real text this cuts the 26 sequential steps to
    roughly max-word-length + 2. Decoded strings and per-string confidences
    are identical either way (positions past a row's first EOS are never
    read by the tokenizer).
    """
    B = memory.shape[0]
    n = cfg.num_steps
    pos_queries = params['pos_queries'].astype(dtype)  # (1, n, D)
    causal = _causal_bias(n)

    tgt_init = jnp.full((B, n), cfg.pad_id, jnp.int32).at[:, 0].set(cfg.bos_id)

    def step(tgt_in, i):
        q = jax.lax.dynamic_slice_in_dim(pos_queries, i, 1, axis=1)
        q = jnp.broadcast_to(q, (B, 1, cfg.embed_dim))
        # Single query at position i sees content keys 0..i.
        qb = jnp.where(jnp.arange(n)[None, :] <= i, 0.0, NEG_INF).astype(jnp.float32)
        out = decode(params, cfg, tgt_in, memory, query=q, query_bias=qb,
                     content_bias=causal, dtype=dtype)
        logits_i = head(params, out)[:, 0]  # (B, C)
        nxt = jnp.argmax(logits_i, axis=-1).astype(jnp.int32)
        # Write the prediction as context for the next step (last step writes
        # nowhere: clamp to stay in bounds, then restore the original column).
        j = jnp.minimum(i + 1, n - 1)
        col = jnp.where(i + 1 < n, nxt, tgt_in[:, n - 1])
        tgt_in = jax.lax.dynamic_update_slice_in_dim(tgt_in, col[:, None], j, axis=1)
        return tgt_in, logits_i

    if not early_exit:
        _, logits = jax.lax.scan(step, tgt_init, jnp.arange(n))
        return logits.transpose(1, 0, 2)  # (B, n, C)

    logits_init = jnp.zeros((B, n, cfg.num_classes), jnp.float32)

    def cond(carry):
        i, tgt_in, _ = carry
        done = jnp.all(jnp.any(tgt_in == cfg.eos_id, axis=-1))
        return jnp.logical_and(i < n, jnp.logical_not(done))

    def body(carry):
        i, tgt_in, logits = carry
        tgt_in, logits_i = step(tgt_in, i)
        logits = jax.lax.dynamic_update_slice_in_dim(
            logits, logits_i.astype(jnp.float32)[:, None], i, axis=1)
        return i + 1, tgt_in, logits

    _, _, logits = jax.lax.while_loop(cond, body, (jnp.int32(0), tgt_init, logits_init))
    return logits


def ar_decode_kvcache(params, cfg: PARSeqConfig, memory, dtype=jnp.float32, early_exit=False):
    """KV-cached greedy AR decode for dec_depth == 1 (PARSeq-S/Ti/224).

    Mathematically identical to ar_decode: with a single decoder layer the
    content stream is never transformer-updated (modules.py:119-123), so the
    self-attention keys/values of content position j depend only on token j.
    Each step therefore projects ONE new content row instead of re-projecting
    all num_steps rows — removes ~2 * n * B * n * D^2 redundant FLOPs — and
    the cross-attention K/V of `memory` are hoisted out of the loop.
    """
    assert cfg.dec_depth == 1, 'KV cache fast path requires dec_depth == 1'
    lp = params['decoder']['layers'][0]
    B = memory.shape[0]
    n = cfg.num_steps
    D = cfg.embed_dim
    h = cfg.dec_num_heads
    dh = D // h
    scale = math.sqrt(D)

    pos_queries = params['pos_queries'].astype(dtype)  # (1, n, D)
    emb_table = params['text_embed']['w'].astype(dtype)  # (num_tokens, D)

    # Hoisted cross-attention K/V of memory.
    mem_k = linear(lp['cross_attn']['k'], memory).reshape(B, -1, h, dh)
    mem_v = linear(lp['cross_attn']['v'], memory).reshape(B, -1, h, dh)

    def content_row(tok_ids, j):
        """Content-stream K/V for one token at position j (j==0 -> BOS, no pos)."""
        emb = scale * emb_table[tok_ids]  # (B, D)
        pos = jax.lax.dynamic_slice_in_dim(pos_queries[0], jnp.maximum(j - 1, 0), 1, 0)[0]
        emb = jnp.where(j > 0, emb + pos.astype(dtype), emb)
        cn = layer_norm(lp['norm_c'], emb)
        k = linear(lp['self_attn']['k'], cn).reshape(B, h, dh)
        v = linear(lp['self_attn']['v'], cn).reshape(B, h, dh)
        return k, v

    def step(carry, i):
        k_cache, v_cache, tok = carry  # caches: (B, n, h, dh); tok: (B,) last token
        k_new, v_new = content_row(tok, i)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new[:, None], i, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new[:, None], i, axis=1)

        q = jax.lax.dynamic_slice_in_dim(pos_queries, i, 1, axis=1)
        q = jnp.broadcast_to(q, (B, 1, D))
        qn = layer_norm(lp['norm_q'], q)
        qh = linear(lp['self_attn']['q'], qn).reshape(B, 1, h, dh)
        # self-attn over cached content rows 0..i
        s = jnp.einsum('bqhd,bkhd->bhqk', qh, k_cache,
                       preferred_element_type=jnp.float32) / math.sqrt(dh)
        s = s + jnp.where(jnp.arange(n)[None, None, None, :] <= i, 0.0, NEG_INF)
        a = jax.nn.softmax(s, axis=-1).astype(dtype)
        sa = jnp.einsum('bhqk,bkhd->bqhd', a, v_cache).reshape(B, 1, D)
        tgt = q + linear(lp['self_attn']['out'], sa)
        # cross-attn to memory (hoisted K/V)
        cq = linear(lp['cross_attn']['q'], layer_norm(lp['norm1'], tgt)).reshape(B, 1, h, dh)
        cs = jnp.einsum('bqhd,bkhd->bhqk', cq, mem_k,
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
        ca = jax.nn.softmax(cs, axis=-1).astype(dtype)
        co = jnp.einsum('bhqk,bkhd->bqhd', ca, mem_v).reshape(B, 1, D)
        tgt = tgt + linear(lp['cross_attn']['out'], co)
        # MLP
        hdn = layers.gelu(linear(lp['linear1'], layer_norm(lp['norm2'], tgt)))
        tgt = tgt + linear(lp['linear2'], hdn)
        out = layer_norm(params['decoder']['norm'], tgt)
        logits_i = head(params, out)[:, 0]
        nxt = jnp.argmax(logits_i, axis=-1).astype(jnp.int32)
        return (k_cache, v_cache, nxt), logits_i

    init = (
        jnp.zeros((B, n, h, dh), dtype),
        jnp.zeros((B, n, h, dh), dtype),
        jnp.full((B,), cfg.bos_id, jnp.int32),  # token entering at position 0 = BOS
    )
    if not early_exit:
        _, logits = jax.lax.scan(step, init, jnp.arange(n))
        return logits.transpose(1, 0, 2)

    logits_init = jnp.zeros((B, n, cfg.num_classes), jnp.float32)

    def cond(carry):
        i, st, _, seen_eos = carry
        return jnp.logical_and(i < n, jnp.logical_not(jnp.all(seen_eos)))

    def body(carry):
        i, st, logits, seen_eos = carry
        st, logits_i = step(st, i)
        seen_eos = seen_eos | (st[2] == cfg.eos_id)
        logits = jax.lax.dynamic_update_slice_in_dim(
            logits, logits_i.astype(jnp.float32)[:, None], i, axis=1)
        return i + 1, st, logits, seen_eos

    seen0 = jnp.zeros((B,), bool)
    _, _, logits, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), init, logits_init, seen0))
    return logits


def nar_decode(params, cfg: PARSeqConfig, memory, dtype=jnp.float32):
    """Single parallel decode with BOS-only context (model.py:149-152)."""
    B = memory.shape[0]
    bos = jnp.full((B, 1), cfg.bos_id, jnp.int32)
    q = jnp.broadcast_to(params['pos_queries'].astype(dtype), (B, cfg.num_steps, cfg.embed_dim))
    out = decode(params, cfg, bos, memory, query=q, dtype=dtype)
    return head(params, out)


def refine(params, cfg: PARSeqConfig, memory, logits, dtype=jnp.float32):
    """Iterative cloze refinement (model.py:154-167)."""
    n = cfg.num_steps
    r = jnp.arange(n)
    # Cloze query bias: query i sees every context token EXCEPT its own
    # previous prediction (content position i+1). Derived in the reference by
    # taking the AR mask triu(1) and clearing triu(2) (model.py:157), which
    # leaves only the first superdiagonal masked.
    cloze = jnp.where(r[None, :] == r[:, None] + 1, NEG_INF, 0.0).astype(jnp.float32)
    # The reference aliases tgt_mask and query_mask (model.py:117), so the
    # in-place cloze edit also applies to the content mask: during refinement
    # the content stream uses the cloze mask as well (only visible when
    # dec_depth > 1, but we reproduce it exactly).
    B = memory.shape[0]
    bos = jnp.full((B, 1), cfg.bos_id, jnp.int32)
    q = jnp.broadcast_to(params['pos_queries'].astype(dtype), (B, n, cfg.embed_dim))
    for _ in range(cfg.refine_iters):
        tgt_in = jnp.concatenate([bos, jnp.argmax(logits[:, :-1], axis=-1).astype(jnp.int32)], axis=1)
        # Mask context tokens at and beyond the first EOS.
        padding_mask = jnp.cumsum(tgt_in == cfg.eos_id, axis=-1) > 0
        out = decode(params, cfg, tgt_in, memory, query=q, query_bias=cloze,
                     content_bias=cloze, padding_mask=padding_mask, dtype=dtype)
        logits = head(params, out)
    return logits


def forward(params, cfg: PARSeqConfig, images, dtype=jnp.float32, early_exit=False,
            use_fused_ar=True):
    """Full inference: encode -> AR or NAR decode -> refinement.

    Always decodes the full num_steps positions (static shape); the
    reference's optional `max_length` shortening (model.py:106-110) only
    trims compute, never changes decoded strings, because the tokenizer
    truncates at the first EOS. `early_exit` enables the reference's
    test-time batch early exit in the AR loop (see ar_decode).
    """
    images = images.astype(dtype)
    memory = encode(params, cfg, images)
    if cfg.decode_ar:
        # AR implementations, measured on v5e-1 at batch 256 (PERF.md):
        #   ar_decode_fused (pallas whole-loop kernel, DEFAULT on TPU when
        #     dec_depth == 1) — fastest AND numerically closest to the f32
        #     ground truth of any bf16 path: f32 residual stream + f32
        #     attention scores inside the kernel (PERF.md equivalence table)
        #   lax.scan — used on CPU, for dec_depth > 1, with early_exit, and
        #     whenever use_fused_ar=False; standard bf16 activation profile
        #   ar_decode_kvcache — slower (op-dispatch-bound loop), kept as a
        #     derivation reference
        if (use_fused_ar and not early_exit and cfg.dec_depth == 1
                and jax.default_backend() != 'cpu'):
            from parseq_tpu.ops.ar_kernel import ar_decode_fused

            logits = ar_decode_fused(params, cfg, memory.astype(jnp.bfloat16))
        else:
            logits = ar_decode(params, cfg, memory, dtype, early_exit=early_exit)
    else:
        logits = nar_decode(params, cfg, memory, dtype)
    if cfg.refine_iters:
        logits = refine(params, cfg, memory, logits, dtype)
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training: permutations, masks, loss (system.py:90-200)
# ---------------------------------------------------------------------------


def gen_tgt_perms(rng, cfg: PARSeqConfig, max_num_chars=None):
    """Host-side (numpy) permutation sampling, reference semantics
    (system.py:90-151). Returns int32 (K, max_num_chars + 2) including the
    BOS slot (always 0) and EOS slot (always last).

    With fixed-shape targets max_num_chars is always max_label_length; the
    padding mask makes the same masks valid for shorter sequences (see the
    reference's own docstring, system.py:91-94).
    """
    import numpy as np

    if max_num_chars is None:
        max_num_chars = cfg.max_label_length
    if max_num_chars == 1:
        return np.arange(3, dtype=np.int32)[None]

    max_gen_perms = cfg.perm_num // 2 if cfg.perm_mirrored else cfg.perm_num
    perms = [np.arange(max_num_chars, dtype=np.int64)] if cfg.perm_forward else []
    max_perms = math.factorial(max_num_chars)
    if cfg.perm_mirrored:
        max_perms //= 2
    num_gen_perms = min(max_gen_perms, max_perms)
    if max_num_chars < 5:
        from itertools import permutations as iperms

        if max_num_chars == 4 and cfg.perm_mirrored:
            selector = [0, 3, 4, 6, 9, 10, 12, 16, 17, 18, 19, 21]
        else:
            selector = list(range(max_perms))
        perm_pool = np.asarray(list(iperms(range(max_num_chars))), dtype=np.int64)[selector]
        if cfg.perm_forward:
            perm_pool = perm_pool[1:]
        perms = np.stack(perms) if perms else np.zeros((0, max_num_chars), np.int64)
        if len(perm_pool):
            i = rng.choice(len(perm_pool), size=num_gen_perms - len(perms), replace=False)
            perms = np.concatenate([perms, perm_pool[i]])
    else:
        perms.extend(rng.permutation(max_num_chars) for _ in range(num_gen_perms - len(perms)))
        perms = np.stack(perms)
    if cfg.perm_mirrored:
        comp = perms[:, ::-1]
        # Interleave so that each pair (perm, reversed perm) is adjacent.
        perms = np.stack([perms, comp], axis=1).reshape(-1, max_num_chars)
    bos_idx = np.zeros((len(perms), 1), np.int64)
    eos_idx = np.full((len(perms), 1), max_num_chars + 1, np.int64)
    perms = np.concatenate([bos_idx, perms + 1, eos_idx], axis=1)
    if len(perms) > 1:
        # Second perm: strict reverse ramp -> reverse context for chars and
        # null context for EOS (needed to learn NAR EOS prediction).
        perms[1, 1:] = max_num_chars + 1 - np.arange(max_num_chars + 1)
    return perms.astype(np.int32)


def perm_attn_masks(perm):
    """Vectorized equivalent of generate_attn_masks (system.py:153-167).

    perm: int (L,) — a permutation over [0, L) with perm[0] == 0 (BOS).
    Returns (content_bias, query_bias): additive biases of shape
    (L-1, L-1), where content position k may be attended by query position q
    iff k comes no later than q in the permutation order (and q != k for the
    query stream).
    """
    L = perm.shape[0]
    rank = jnp.argsort(perm)  # rank[token_pos] = index in permutation order
    masked = rank[None, :] > rank[:, None]  # key strictly later than query
    content_bias = jnp.where(masked[:-1, :-1], NEG_INF, 0.0)
    masked_self = masked | jnp.eye(L, dtype=bool)
    query_bias = jnp.where(masked_self[1:, :-1], NEG_INF, 0.0)
    return content_bias.astype(jnp.float32), query_bias.astype(jnp.float32)


def multi_perm_loss(params, cfg: PARSeqConfig, images, tgt_ids, perms, *, dtype=jnp.float32, rng=None):
    """Training loss over K permutations (system.py:169-200).

    tgt_ids: (B, max_label_length + 2) from Tokenizer.encode.
    perms: (K, max_label_length + 2) from gen_tgt_perms.
    Per-element CE with PAD ignored; EOS positions contribute only for the
    first two permutations (forward + reverse), then are treated as PAD.
    Returns (loss, loss_numel).
    """
    images = images.astype(dtype)
    memory = encode(params, cfg, images)
    tgt_in = tgt_ids[:, :-1]
    tgt_out = tgt_ids[:, 1:]
    padding_mask = (tgt_in == cfg.pad_id) | (tgt_in == cfg.eos_id)

    content_bias, query_bias = jax.vmap(perm_attn_masks)(perms)  # (K, L-1, L-1)

    K = perms.shape[0]

    def decode_one(cb, qb, r):
        out = decode(params, cfg, tgt_in, memory, query_bias=qb, content_bias=cb,
                     padding_mask=padding_mask, dtype=dtype, drop=cfg.dropout, rng=r)
        return head(params, out)  # (B, L-1, C)

    if rng is None or cfg.shared_perm_dropout:
        # rng unbatched under vmap: one mask draw per dropout site, shared by
        # all K perms (and the perm-independent content embedding hoists out
        # of the vmap). See PARSeqConfig.shared_perm_dropout.
        logits = jax.vmap(decode_one, in_axes=(0, 0, None))(content_bias, query_bias, rng)
    elif cfg.bulk_dropout_bits and cfg.dropout > 0.0:
        # One RngBitGenerator call per site for all K perms; vmap slices the
        # leading K axis so each perm still gets independent masks.
        B_, Lq = tgt_in.shape
        shapes = dropout_site_shapes(cfg, B_, Lq, memory.shape[1])
        site_keys = _rng_list(rng, len(shapes))
        # uint8 bits cannot represent rates below 1/512 (round(p*256) == 0
        # would silently disable dropout) — fall back to uint16 there.
        u8_ok = cfg.bulk_bits_uint8 and round(cfg.dropout * 256.0) >= 1
        bits_dtype = jnp.uint8 if u8_ok else jnp.uint16
        bits = [jax.random.bits(k, (K, *s), bits_dtype)
                for k, s in zip(site_keys, shapes)]
        logits = jax.vmap(decode_one)(content_bias, query_bias, bits)
    else:
        rngs = _rng_list(rng, K)
        logits = jax.vmap(decode_one)(content_bias, query_bias, jnp.stack(rngs))

    # Validity: PAD never counts; EOS counts only for perm index < 2.
    base_valid = tgt_out != cfg.pad_id  # (B, L-1)
    eos_pos = tgt_out == cfg.eos_id
    k_idx = jnp.arange(K)[:, None, None]
    valid = base_valid[None] & ((k_idx < 2) | ~eos_pos[None])  # (K, B, L-1)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt_safe = jnp.clip(tgt_out, 0, cfg.num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt_safe[None, ..., None].repeat(K, 0), axis=-1)[..., 0]
    loss_sum = jnp.sum(nll * valid)
    loss_numel = jnp.sum(valid)
    return loss_sum / jnp.maximum(loss_numel, 1), loss_numel


def logits_loss(params, cfg: PARSeqConfig, images, tgt_ids, dtype=jnp.float32):
    """Validation loss (CrossEntropySystem.forward_logits_loss, base.py:194-201):
    full inference forward, CE against [chars..., EOS] with PAD ignored.

    Fixed-shape version: always num_steps positions (the reference trims to
    the batch-max label length; extra positions here are PAD-masked, so the
    mean matches).
    Returns (logits, loss, loss_numel).
    """
    logits = forward(params, cfg, images, dtype=dtype)
    targets = tgt_ids[:, 1:]  # discard BOS -> (B, num_steps + 1)
    targets = targets[:, : cfg.num_steps]
    valid = targets != cfg.pad_id
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_safe = jnp.clip(targets, 0, cfg.num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    numel = jnp.sum(valid)
    loss = jnp.sum(nll * valid) / jnp.maximum(numel, 1)
    return logits, loss, numel
