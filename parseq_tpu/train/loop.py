"""Training loop: SPMD data-parallel, OneCycle + SWA, top-k checkpointing.

Replaces the reference's Lightning Trainer stack (train.py:53-108) with an
explicit jit-compiled loop: batch sharded over the ('data',) mesh, params
replicated, gradient psum inserted by XLA. Supports every model family via
train.families adapters (PARSeq perms, ViTSTR CE, CRNN/TRBC CTC, TRBA
teacher forcing, ABINet staged pretrain->joint). Validation every
`val_check_interval` steps computes accuracy/NED/loss over the val tree and
drives ModelCheckpoint-style top-k retention on val_accuracy.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from parseq_tpu.data.module import SceneTextDataModule
from parseq_tpu.ops import ctc as ctc_ops
from parseq_tpu.parallel import global_batch, make_mesh, replicate
from parseq_tpu.train import optim
from parseq_tpu.train.evaluate import BatchResult, _normalize_u8, score_decoded, summarize
from parseq_tpu.train.families import get_family
from parseq_tpu.train.steps import make_train_step, normalize_images
from parseq_tpu.utils.checkpoint import save_checkpoint, save_topk
from parseq_tpu.utils.registry import create_model

log = logging.getLogger(__name__)


class JsonlLogger:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, **kv):
        with open(self.path, 'a') as f:
            f.write(json.dumps(kv) + '\n')


def _as_tree(params):
    return params if (isinstance(params, dict) and 'stats' in params and 'params' in params) else {
        'params': params, 'stats': {}}


# Compiled-step reuse across train() calls that differ only in LR (tune
# trials): key -> (tx, jitted step dict, jitted fwd). Works because with
# optim.make_optimizer(inject_lr=True) the LR lives in the optimizer state,
# so the compiled computation is LR-independent (PERF.md "next levers" #3).
# Bounded LRU: compiled executables pin device memory, and tune inserts one
# entry per rung (total_steps is in the key) — keep the few most recent.
_COMPILE_CACHE: dict = {}
_COMPILE_CACHE_MAX = 4


def _cache_put(key, value):
    _COMPILE_CACHE.pop(key, None)
    _COMPILE_CACHE[key] = value
    while len(_COMPILE_CACHE) > _COMPILE_CACHE_MAX:
        _COMPILE_CACHE.pop(next(iter(_COMPILE_CACHE)))


def train(config: dict, work_dir: str, *, compute_dtype=jnp.bfloat16,
          max_steps: int | None = None, seed: int = 0, val_callback=None,
          reuse_compiled=False):
    """Run training from a composed config dict (utils.config.compose()).

    val_callback, if given, is invoked after every validation with a metrics
    dict (step, training_iteration, loss, NED, accuracy); returning True stops
    training early — the hook the tune CLI's stoppers plug into (reference
    tune.py:42-91 stop semantics via Ray's `tune.Stopper` protocol).

    reuse_compiled: share compiled train/eval steps across train() calls in
    this process that differ only in model.lr (the tune CLI's trial loop) —
    the LR is injected into optimizer state instead of baked into the
    schedule. Not supported for ABINet's staged multi-LR training (falls
    back to per-call compilation).
    """
    # Multi-host SPMD: every process runs this loop in lockstep over the same
    # global mesh; only process 0 writes checkpoints/metrics (reference DDP
    # rank-zero semantics).
    is_main = jax.process_index() == 0
    work_dir = Path(work_dir)
    if is_main:
        work_dir.mkdir(parents=True, exist_ok=True)
        (work_dir / 'config.json').write_text(json.dumps(config, indent=2, default=str))
    jlog = JsonlLogger(work_dir / 'metrics.jsonl') if is_main else None
    # TensorBoard-compatible scalar events (reference train.py:101-107
    # TensorBoardLogger), written by our own tfevents encoder.
    from parseq_tpu.utils.tbevents import TBEventWriter

    tb = TBEventWriter(work_dir / 'tb') if is_main else None

    mcfg = config['model']
    dcfg = config['data']
    tcfg = config['trainer']
    name = mcfg.get('name', 'parseq')

    bundle = create_model(name, seed=seed, dtype=compute_dtype,
                          **{k: v for k, v in mcfg.items() if k != 'name'})
    cfg = bundle.cfg
    tok = bundle.tokenizer
    family = get_family(name)
    tree0 = _as_tree(bundle.params)

    # Same no-silent-drop contract as model.* keys (utils/registry.py): a
    # data.* override that doesn't reach the DataModule trains on different
    # data than requested. The reference instantiates the module via hydra,
    # which errors on unexpected kwargs.
    _known_data = {'root_dir', 'train_dir', 'batch_size', 'num_workers',
                   'augment', 'remove_whitespace', 'normalize_unicode',
                   'min_image_dim', 'rotation', 'img_size', 'charset_train',
                   'charset_test', 'max_label_length'}
    _unknown_data = set(dcfg) - _known_data
    if _unknown_data:
        raise ValueError(f'unknown data config key(s): {sorted(_unknown_data)}; '
                         f'accepted: {sorted(_known_data)}')
    _known_trainer = {'microbatches', 'val_check_interval', 'max_epochs',
                      'max_steps', 'gradient_clip_val', 'devices', 'swa',
                      'limit_train_batches', 'accumulate_grad_batches',
                      'swa_epoch_start',
                      'multihost'}  # multihost consumed by cli/train.py
    _unknown_trainer = set(tcfg) - _known_trainer
    if _unknown_trainer:
        raise ValueError(f'unknown trainer config key(s): '
                         f'{sorted(_unknown_trainer)}; accepted: '
                         f'{sorted(_known_trainer)}')
    # Interpolated keys (reference main.yaml: data.img_size: ${model.img_size}
    # etc.) honor an explicit data.* override, falling back to model.* —
    # every key the guard above accepts is genuinely consumed here.
    dm = SceneTextDataModule(
        dcfg.get('root_dir', 'data'), dcfg.get('train_dir', 'real'),
        dcfg.get('img_size', mcfg['img_size']),
        dcfg.get('max_label_length', mcfg['max_label_length']),
        dcfg.get('charset_train', mcfg['charset_train']),
        dcfg.get('charset_test') or mcfg.get('charset_test') or mcfg['charset_train'],
        dcfg.get('batch_size', mcfg.get('batch_size', 384)),
        dcfg.get('num_workers', 2), dcfg.get('augment', True),
        dcfg.get('remove_whitespace', True), dcfg.get('normalize_unicode', True),
        min_image_dim=dcfg.get('min_image_dim', 0),
        rotation=dcfg.get('rotation', 0),
    )
    n_procs = jax.process_count()
    train_loader = dm.train_dataloader(seed=seed, shard_rank=jax.process_index(),
                                       shard_count=n_procs)
    if len(train_loader) == 0:
        raise ValueError(
            f'empty training loader: {len(dm.train_dataset)} samples with '
            f'batch_size={dm.batch_size} (drop_last) yields no batches')
    limit = tcfg.get('limit_train_batches', 1.0)
    steps_per_epoch = max(1, int(len(train_loader) * limit))  # loader batches
    # Gradient accumulation (Lightning trainer.accumulate_grad_batches; the
    # LR rule base.py:99-102 multiplies by it): one optimizer step per `agb`
    # loader micro-batches, via optax.MultiSteps (gradient running mean —
    # Lightning's loss/agb scaling equivalent). max_steps/val_check_interval
    # count optimizer steps; the loop itself runs in micro-batch units.
    agb = max(1, int(tcfg.get('accumulate_grad_batches', 1)))
    opt_steps_per_epoch = max(1, steps_per_epoch // agb)
    total_steps = tcfg.get('max_steps') or opt_steps_per_epoch * tcfg.get('max_epochs', 20)
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    val_interval = tcfg.get('val_check_interval', 1000)
    total_micro = total_steps * agb
    val_every_micro = val_interval * agb

    n_devices = min(tcfg.get('devices', 1), len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_devices])
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P('data'))

    ocfg = optim.OptimConfig(
        lr=mcfg['lr'], weight_decay=mcfg.get('weight_decay', 0.0),
        warmup_pct=mcfg.get('warmup_pct', 0.075),
        batch_size=dm.batch_size, grad_clip=tcfg.get('gradient_clip_val', 20.0),
        total_steps=total_steps, num_devices=n_devices, accum=agb,
        swa=tcfg.get('swa', True),
        # Was silently dropped before the unknown-key guard below existed:
        # tests/test_resume.py set trainer.swa_epoch_start=0.0 and trained
        # under the 0.75 default instead.
        swa_epoch_start=tcfg.get('swa_epoch_start', 0.75),
    )
    # Optional pretrained weights (train.py:79-81): native ckpt or torch .pt.
    if config.get('pretrained'):
        from parseq_tpu.utils.registry import load_from_checkpoint

        pre = load_from_checkpoint(config['pretrained'],
                                   **{k: v for k, v in mcfg.items() if k != 'name'})
        tree0 = _as_tree(pre.params)
        log.info(f'loaded pretrained weights from {config["pretrained"]}')

    is_abinet = 'abinet' in name
    pretrain_frac = 8 / 18  # system.py:106-110
    reuse_compiled = reuse_compiled and not is_abinet
    cache_key = None
    if reuse_compiled:
        import dataclasses

        cache_key = (name, cfg, dataclasses.replace(ocfg, lr=0.0), compute_dtype,
                     tuple(d.id for d in jax.devices()[:n_devices]),
                     bool(mcfg.get('lm_only')))
    if is_abinet:
        tx, sched = optim.make_abinet_optimizer(
            ocfg, mcfg.get('l_lr', mcfg['lr']), int(pretrain_frac * total_steps),
            tree0['params'])
    elif cache_key in _COMPILE_CACHE:
        tx = _COMPILE_CACHE[cache_key][0]
        sched = optim.lr_schedule(ocfg)  # log-only; tx LR set via opt_state
    else:
        tx, sched = optim.make_optimizer(ocfg, tree0['params'],
                                         inject_lr=reuse_compiled)
    if agb > 1 and not (cache_key in _COMPILE_CACHE):
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=agb)
    state = {'params': tree0['params'], 'stats': tree0['stats'],
             'opt_state': tx.init(tree0['params']), 'step': jnp.zeros((), jnp.int32)}
    if reuse_compiled:
        # tx.init seeded step_size from the tx-construction-time LR; make the
        # trial's LR explicit regardless of which cached tx we reused.
        state['opt_state'] = optim.set_injected_lr(state['opt_state'], ocfg.lr)

    # Resume full training state (reference ckpt_path, train.py:96-108).
    start_step = 0
    resume = config.get('ckpt_path')
    if resume:
        from flax import serialization

        with open(resume, 'rb') as f:
            state = serialization.from_bytes(state, f.read())
        start_step = int(state['step'])
        log.info(f'resumed training state from {resume} at step {start_step}')
    state = replicate(state, mesh)
    # Clamped to step 1: micro-steps count from 1, so swa_epoch_start=0.0
    # ("average from the very start") must snapshot at the FIRST step, not
    # at the never-taken step 0 (snapshots fire when
    # (step - swa_start) % steps_per_epoch == 0, below).
    swa_start = max(1, int(ocfg.swa_epoch_start * total_micro)) if ocfg.swa else total_micro
    swa_state = None
    if resume:
        swa_path = Path(resume).parent / 'swa_state.ckpt'
        if swa_path.exists():
            from flax import serialization

            template = optim.swa_init(jax.device_get(state)['params'])
            with open(swa_path, 'rb') as f:
                swa_state = replicate(serialization.from_bytes(template, f.read()), mesh)
            log.info(f'resumed SWA average ({int(jax.device_get(swa_state["n"]))} snapshots)')

    # ABINet staged training: two compiled steps, switched on host by step
    # count (abinet/system.py:106-110, 187-203).
    # microbatches: in-jit batch split with DDP-equal-weight grad averaging
    # (see steps.make_train_step; measured 137.7 -> ~102 ms at PARSeq-S
    # bs=384 with x4).
    mb = max(1, int(tcfg.get('microbatches', 1)))
    steps_by_phase = {}
    lm_only = bool(mcfg.get('lm_only')) and is_abinet
    if lm_only:
        steps_by_phase[False] = make_train_step(family, cfg, tx, compute_dtype,
                                                microbatches=mb, lm_only=True)
        is_abinet = False  # no phase switching in lm_only mode
    elif is_abinet:
        steps_by_phase[True] = make_train_step(family, cfg, tx, compute_dtype,
                                               microbatches=mb, pretraining=True)
        steps_by_phase[False] = make_train_step(family, cfg, tx, compute_dtype,
                                                microbatches=mb, pretraining=False)
    else:
        steps_by_phase[False] = make_train_step(family, cfg, tx, compute_dtype,
                                                microbatches=mb)

    def jit_step(fn):
        # batch shardings are set per-array by device_put (data for batch-dim
        # arrays, replicated for shared ones like perms) and inferred here.
        return jax.jit(fn, in_shardings=(repl, None, repl), out_shardings=(repl, repl),
                       donate_argnums=(0,))

    if cache_key is not None and cache_key in _COMPILE_CACHE:
        _, jitted, fwd = _COMPILE_CACHE[cache_key]
    else:
        jitted = {k: jit_step(v) for k, v in steps_by_phase.items()}
        # out_shardings=repl: the all-gathered logits are addressable on every
        # host, so device_get works under multi-process too.
        fwd = jax.jit(bundle.forward_fn, in_shardings=(repl, data_sh),
                      out_shardings=repl)
        if cache_key is not None:
            _cache_put(cache_key, (tx, jitted, fwd))
    alignment_reset_done = (not is_abinet) or start_step >= pretrain_frac * total_micro

    perm_rng = np.random.default_rng(seed)  # identical stream on every host
    # unsafe_rbg: TPU hardware RNG for dropout bits — measured ~3 ms/step
    # faster than threefry at PARSeq-S bs=384 (dropout only needs iid bits;
    # the data-side stream is host numpy and unaffected).
    base_rng = replicate(jax.random.key(seed, impl='unsafe_rbg'), mesh)

    # Device-side val post-processing: softmax/argmax/gather + the val loss
    # under one jit, so the per-batch fetch is ids+conf+2 scalars instead of
    # the full (B, L, C) probability tensor (relay fetch moves ~8.4 MB/s —
    # PERF.md fetch-scaling; a bs=384 prob tensor is ~3.9 MB ≈ 0.5 s).
    @jax.jit
    def _val_post_ce(logits, targets, n_valid_rows):
        B = targets.shape[0]
        pad_id = len(tok) - 1
        valid = (targets != pad_id) & (jnp.arange(B)[:, None] < n_valid_rows)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        numel = jnp.sum(valid)
        loss = jnp.sum(nll * valid) / jnp.maximum(numel, 1)
        probs = jnp.exp(logp)
        ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        conf = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]
        return ids, conf, loss, numel

    @jax.jit
    def _val_post_ctc(logits, targets, lengths, n_valid_rows):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        per = ctc_ops.ctc_loss(lp, targets, lengths, reduction='none')
        row = jnp.arange(targets.shape[0]) < n_valid_rows
        loss = jnp.sum(jnp.where(row, per / jnp.maximum(lengths, 1), 0.0)) \
            / jnp.maximum(n_valid_rows, 1)
        probs = jnp.exp(lp)
        ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        conf = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]
        return ids, conf, loss, n_valid_rows

    def val_post(logits, labels, batch_size):
        """-> (ids, conf, loss, numel): one fused device pass, small fetch."""
        pad = [''] * (batch_size - len(labels))
        if family.val == 'ctc':
            targets = jnp.asarray(tok.encode(labels + pad, cfg.max_label_length))
            lengths = jnp.asarray(tok.lengths(labels + pad, cfg.max_label_length))
            return _val_post_ctc(logits, targets, lengths, len(labels))
        enc = tok.encode(labels + pad, cfg.max_label_length)
        T = logits.shape[1]
        targets = jnp.asarray(enc[:, 1 : T + 1])
        return _val_post_ce(logits, targets, len(labels))

    def validate(tree):
        # Every host evaluates the full val set (loaders unsharded): metrics
        # are identical across hosts with no collective needed — val is small
        # relative to training (reference sync_dist equivalence).
        total = BatchResult()
        for images, labels, valid in dm.val_dataloader():
            B = images.shape[0]
            if n_procs > 1:
                lb = B // n_procs
                local = images[jax.process_index() * lb:(jax.process_index() + 1) * lb]
                x = global_batch(local, mesh)
            else:
                x = jnp.asarray(images)
            if x.dtype == jnp.uint8:  # u8 loader transport; same op order
                x = _normalize_u8(x)
            logits = fwd(_maybe_flatten(tree), x)
            ids, conf, loss, numel = jax.device_get(val_post(logits, labels, B))
            preds, pred_probs = tok.decode_ids(ids, conf)
            total.add(score_decoded(bundle.charset_adapter, preds, pred_probs,
                                    labels, valid, float(loss), int(numel)))
        res = summarize('val', total)
        val_loss = total.loss / max(total.loss_numel, 1)
        return res, val_loss

    def _maybe_flatten(tree):
        # bundle.forward_fn takes either bare params or {'params','stats'}
        if isinstance(bundle.params, dict) and 'stats' in bundle.params:
            return {'params': tree['params'], 'stats': tree['stats']}
        return tree['params']

    step = start_step
    t_start = time.time()
    best_path = None
    stop_early = False
    n_validations = 0
    # Resume continues the data stream where it left off: same epoch shuffle
    # order (set_epoch), skipping the batches already consumed.
    start_epoch = start_step // steps_per_epoch
    skip_batches = start_step % steps_per_epoch
    log.info(f'training {name}: {total_steps} steps, {steps_per_epoch}/epoch, mesh={n_devices}dev')
    for epoch in range(start_epoch, 10 ** 9):
        if step >= total_micro or stop_early:
            break
        train_loader.set_epoch(epoch)
        for bi, (images, labels, valid) in enumerate(train_loader):
            if step >= total_micro or bi >= steps_per_epoch:
                break
            if epoch == start_epoch and bi < skip_batches:
                continue
            pretraining = is_abinet and step < pretrain_frac * total_micro
            if is_abinet and not pretraining and not alignment_reset_done:
                # Reset alignment params once at the phase switch (system.py:197-201)
                log.info('ABINet pretraining ends: resetting alignment model')
                from parseq_tpu.models import abinet as abinet_mod

                new_align = abinet_mod.alignment_init(jax.random.key(seed + 1), cfg)
                params = dict(state['params'])
                params['alignment'] = replicate(new_align, mesh)
                state = dict(state, params=params)
                alignment_reset_done = True
            # batch-dim arrays (leading dim == local batch) are globally
            # sharded from each host's slice; shared arrays (perms) are
            # replicated — identical on every host by perm_rng construction.
            batch = {'images': images}
            batch.update(family.prepare(tok, labels, cfg, perm_rng))
            batch = {k: global_batch(v, mesh) if v.shape[:1] == (images.shape[0],)
                     else replicate(jnp.asarray(v), mesh)
                     for k, v in batch.items()}
            state, metrics = jitted[pretraining if is_abinet else False](state, batch, base_rng)
            step += 1
            if (step % 50 == 0 or step == start_step + 1) and jlog:
                m = jax.device_get(metrics)
                jlog.log(step=step, epoch=epoch, loss=float(m['loss']),
                         grad_norm=float(m['grad_norm']), lr=float(sched(step // agb)),
                         wall=round(time.time() - t_start, 1))
                tb.add_scalars(step, {'loss': float(m['loss']),
                                      'grad_norm': float(m['grad_norm']),
                                      'lr': float(sched(step // agb))})
            if step % val_every_micro == 0 or step == total_micro:
                res, val_loss = validate(state)
                if jlog:
                    jlog.log(step=step, val_accuracy=res.accuracy, val_NED=res.ned,
                             val_loss=float(val_loss), val_confidence=res.confidence)
                    # hp_metric mirrors the reference's TensorBoard summary
                    # metric (base.py:171-177).
                    tb.add_scalars(step, {'val_accuracy': res.accuracy,
                                          'val_NED': res.ned,
                                          'val_loss': float(val_loss),
                                          'hp_metric': res.accuracy})
                log.info(f'step {step}: val_acc={res.accuracy:.2f} NED={res.ned:.2f} loss={val_loss:.4f}')
                if is_main:
                    ckpt_tree = jax.device_get({'params': state['params'], 'stats': state['stats']})
                    best_path = save_topk(work_dir / 'checkpoints', step, res.accuracy,
                                          _maybe_flatten(ckpt_tree), cfg,
                                          meta={'name': name, 'model_config': mcfg}, k=3)
                    # Resumable full training state (params+stats+opt+step).
                    from flax import serialization

                    with open(work_dir / 'checkpoints' / 'train_state.ckpt', 'wb') as f:
                        f.write(serialization.to_bytes(jax.device_get(state)))
                    if swa_state is not None:
                        # Sidecar so a resume mid-SWA-window keeps the
                        # accumulated average (Lightning's SWA callback
                        # persists its state in checkpoints likewise).
                        with open(work_dir / 'checkpoints' / 'swa_state.ckpt', 'wb') as f:
                            f.write(serialization.to_bytes(jax.device_get(swa_state)))
                n_validations += 1
                if val_callback is not None and val_callback({
                        'step': step, 'training_iteration': n_validations,
                        'loss': float(val_loss), 'NED': res.ned,
                        'accuracy': res.accuracy}):
                    log.info(f'early stop requested by val_callback at step {step}')
                    stop_early = True
                    break
            if ocfg.swa and step >= swa_start and (step - swa_start) % steps_per_epoch == 0:
                if swa_state is None:
                    swa_state = optim.swa_init(state['params'])
                swa_state = optim.swa_update(swa_state, state['params'])

    if swa_state is not None and int(jax.device_get(swa_state['n'])) > 0:
        swa_stats = state['stats']
        if jax.tree.leaves(swa_stats):
            # Re-estimate BatchNorm running stats for the averaged weights
            # (Lightning SWA's update_bn semantics, reference train.py:93-95):
            # the running stats in `state` were accumulated under the *last*
            # weights, not the average. One forward-only pass over train data
            # with momentum-0.1 EMA leaves <0.01% of the stale stats after
            # ~100 batches.
            def stats_step(params, stats, batch, rng):
                _, new_stats, _ = family.loss(params, stats, cfg,
                                              normalize_images(batch), rng,
                                              compute_dtype)
                return new_stats

            jstats = jax.jit(stats_step, in_shardings=(repl, repl, None, repl),
                             out_shardings=repl)
            swa_params = swa_state['avg']
            n_bn_batches = min(steps_per_epoch, 100)
            train_loader.set_epoch(10 ** 6)  # fresh shuffle, any order works
            for bi, (images, labels, valid) in enumerate(train_loader):
                if bi >= n_bn_batches:
                    break
                batch = {'images': images}
                batch.update(family.prepare(tok, labels, cfg, perm_rng))
                batch = {k: global_batch(v, mesh) if v.shape[:1] == (images.shape[0],)
                         else replicate(jnp.asarray(v), mesh)
                         for k, v in batch.items()}
                swa_stats = jstats(swa_params, swa_stats, batch, base_rng)
            log.info(f'SWA: re-estimated BatchNorm stats over {n_bn_batches} batches')
        if is_main:
            tree = {'params': jax.device_get(swa_state['avg']), 'stats': jax.device_get(swa_stats)}
            save_checkpoint(work_dir / 'checkpoints' / 'swa.ckpt', _maybe_flatten(tree), cfg,
                            meta={'name': name, 'model_config': mcfg, 'swa': True})
    if tb:
        tb.close()
    return state, best_path
