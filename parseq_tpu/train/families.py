"""Per-family training adapters: batch preparation + loss functions.

Each family supplies:
  prepare(tokenizer, labels, cfg, rng) -> dict of host numpy arrays
  loss(params, stats, cfg, batch, rng, dtype, **static) ->
      (loss, new_stats, loss_numel)

The generic train step (train/steps.py) threads `stats` (BatchNorm running
stats; empty dict for stateless models) functionally and differentiates only
w.r.t. params. Loss semantics follow each reference system's training_step
(SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _ce_ignore_pad(logits, targets, pad_id, num_classes):
    """Token-mean CE with PAD ignored. Returns (loss, numel)."""
    valid = targets != pad_id
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    numel = jnp.sum(valid)
    return jnp.sum(nll * valid) / jnp.maximum(numel, 1), numel


# --- PARSeq -----------------------------------------------------------------


def _parseq_prepare(tok, labels, cfg, rng):
    from parseq_tpu.models import parseq

    return {
        'tgt': tok.encode(labels, cfg.max_label_length),
        'perms': parseq.gen_tgt_perms(rng, cfg),
    }


def _parseq_loss(params, stats, cfg, batch, rng, dtype):
    import dataclasses

    from parseq_tpu.models import parseq

    cfg = dataclasses.replace(cfg, remat=True)  # save encoder activations memory
    loss, numel = parseq.multi_perm_loss(params, cfg, batch['images'], batch['tgt'],
                                         batch['perms'], dtype=dtype, rng=rng)
    return loss, stats, numel


# --- ViTSTR -----------------------------------------------------------------


def _vitstr_prepare(tok, labels, cfg, rng):
    return {'tgt': tok.encode(labels, cfg.max_label_length)}


def _vitstr_loss(params, stats, cfg, batch, rng, dtype):
    from parseq_tpu.models import vitstr

    _, loss, numel = vitstr.logits_loss(params, cfg, batch['images'], batch['tgt'], dtype=dtype)
    return loss, stats, numel


# --- CRNN / TRBC (CTC) --------------------------------------------------------


def _ctc_prepare(tok, labels, cfg, rng):
    return {
        'targets': tok.encode(labels, cfg.max_label_length),
        'lengths': tok.lengths(labels, cfg.max_label_length),
    }


def _crnn_loss(params, stats, cfg, batch, rng, dtype):
    from parseq_tpu.models import crnn

    _, loss, n, new_stats = crnn.logits_loss(
        params, stats, cfg, batch['images'], batch['targets'], batch['lengths'],
        train=True, dtype=dtype)
    return loss, new_stats, n


def _trbc_loss(params, stats, cfg, batch, rng, dtype):
    from parseq_tpu.models import trba
    from parseq_tpu.ops import ctc

    logits, new_stats = trba.forward(params, stats, cfg, batch['images'],
                                     train=True, dtype=dtype)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = ctc.ctc_loss(log_probs, batch['targets'], batch['lengths'], blank=0)
    return loss, new_stats, batch['images'].shape[0]


# --- TRBA (teacher-forced attention) -----------------------------------------


def _trba_prepare(tok, labels, cfg, rng):
    enc = tok.encode(labels, cfg.max_label_length)  # (B, L+2)
    return {'inputs': enc[:, :-1], 'targets': enc[:, 1:]}


def _trba_loss(params, stats, cfg, batch, rng, dtype):
    from parseq_tpu.models import trba

    logits, new_stats = trba.forward(params, stats, cfg, batch['images'],
                                     text=batch['inputs'], train=True, dtype=dtype)
    loss, numel = _ce_ignore_pad(logits, batch['targets'][:, : logits.shape[1]],
                                 cfg.pad_id, cfg.num_tokens)
    return loss, new_stats, numel


# --- ABINet (staged) -----------------------------------------------------------


def _abinet_prepare(tok, labels, cfg, rng):
    enc = tok.encode(labels, cfg.max_label_length)
    targets = enc[:, 1 : cfg.max_length + 1]  # (B, T) [chars..., EOS, PAD...]
    inputs = np.where(targets == cfg.pad_id, cfg.null_label, targets)
    lengths = np.asarray([len(l) + 1 for l in labels], np.int32)
    return {'targets': targets, 'lm_inputs': inputs, 'lengths': lengths}


def _abinet_res_loss(res_list, targets, cfg):
    """calc_loss (abinet/system.py:147-159): mean CE across a result list."""
    if isinstance(res_list, dict):
        res_list = [res_list]
    loss = 0.0
    numel = 0
    for res in res_list:
        l, n = _ce_ignore_pad(res['logits'], targets, cfg.pad_id, cfg.num_classes)
        loss += l
        numel = n
    return loss / len(res_list), numel


def _abinet_loss(params, stats, cfg, batch, rng, dtype, *, pretraining=False, lm_only=False):
    from parseq_tpu.models import abinet

    images = batch['images'].astype(dtype)
    targets = batch['targets']
    onehot = jax.nn.one_hot(batch['lm_inputs'], cfg.num_classes, dtype=dtype)
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    drop = cfg.dropout

    if lm_only:
        # Train the BCN LM alone on ground-truth inputs (system.py:100-104,
        # 183-185); vision/alignment receive no gradient (their params are
        # untouched by this loss).
        l_res = abinet.language_forward(params['language'], cfg, onehot,
                                        batch['lengths'], drop=drop, rng=rngs[1])
        loss, numel = _abinet_res_loss(l_res, targets, cfg)
        return cfg.l_loss_weight * loss, stats, numel

    if pretraining:
        # Independent submodel training (system.py:187-195)
        v_res, v_ns = abinet.vision_forward(params['vision'], stats['vision'], cfg,
                                            images, train=True, drop=drop, rng=rngs[0])
        ns = {'vision': v_ns}
        l_res = abinet.language_forward(params['language'], cfg, onehot,
                                        batch['lengths'], drop=drop, rng=rngs[1])
        a_res = abinet.alignment_forward(
            params['alignment'], cfg,
            jax.lax.stop_gradient(l_res['feature']),
            jax.lax.stop_gradient(v_res['feature']))
        v_loss, numel = _abinet_res_loss(v_res, targets, cfg)
        l_loss, _ = _abinet_res_loss(l_res, targets, cfg)
        a_loss, _ = _abinet_res_loss(a_res, targets, cfg)
    else:
        all_a, all_l, v_res, ns = abinet.forward(params, stats, cfg, images,
                                                 train=True, drop=drop, rng=rngs[2])
        v_loss, numel = _abinet_res_loss(v_res, targets, cfg)
        l_loss, _ = _abinet_res_loss(all_l, targets, cfg)
        a_loss, _ = _abinet_res_loss(all_a, targets, cfg)
    loss = (cfg.v_loss_weight * v_loss + cfg.l_loss_weight * l_loss
            + cfg.a_loss_weight * a_loss)
    return loss, {'vision': ns['vision']}, numel


# --- registry -----------------------------------------------------------------


class TrainFamily:
    def __init__(self, prepare, loss, val='ce'):
        self.prepare = prepare
        self.loss = loss
        self.val = val  # 'ce' | 'ctc'


FAMILIES = {
    'parseq': TrainFamily(_parseq_prepare, _parseq_loss),
    'vitstr': TrainFamily(_vitstr_prepare, _vitstr_loss),
    'crnn': TrainFamily(_ctc_prepare, _crnn_loss, val='ctc'),
    'trba': TrainFamily(_trba_prepare, _trba_loss),
    'trbc': TrainFamily(_ctc_prepare, _trbc_loss, val='ctc'),
    'abinet': TrainFamily(_abinet_prepare, _abinet_loss),
}


def get_family(name: str) -> TrainFamily:
    for key in ('abinet', 'crnn', 'parseq', 'trbc', 'trba', 'vitstr'):
        if key in name:
            return FAMILIES[key]
    raise KeyError(name)
