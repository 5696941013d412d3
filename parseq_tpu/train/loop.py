"""Training loop: SPMD data-parallel, OneCycle + SWA, top-k checkpointing.

Replaces the reference's Lightning Trainer stack (train.py:53-108) with an
explicit jit-compiled loop: batch sharded over the ('data',) mesh, params
replicated, gradient psum inserted by XLA. Validation every
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
from parseq_tpu.models import parseq
from parseq_tpu.parallel import make_mesh
from parseq_tpu.train import optim
from parseq_tpu.train.evaluate import BatchResult, score_batch, summarize
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


def train(config: dict, work_dir: str, *, compute_dtype=jnp.bfloat16,
          max_steps: int | None = None, seed: int = 0):
    """Run training from a composed config dict (utils.config.compose())."""
    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    (work_dir / 'config.json').write_text(json.dumps(config, indent=2, default=str))
    jlog = JsonlLogger(work_dir / 'metrics.jsonl')

    mcfg = config['model']
    dcfg = config['data']
    tcfg = config['trainer']

    bundle = create_model(mcfg.get('name', 'parseq'), seed=seed, dtype=compute_dtype,
                          **{k: v for k, v in mcfg.items() if k != 'name'})
    cfg = bundle.cfg
    tok = bundle.tokenizer

    dm = SceneTextDataModule(
        dcfg.get('root_dir', 'data'), dcfg.get('train_dir', 'real'),
        mcfg['img_size'], mcfg['max_label_length'], mcfg['charset_train'],
        mcfg.get('charset_test') or mcfg['charset_train'],
        dcfg.get('batch_size', mcfg.get('batch_size', 384)),
        dcfg.get('num_workers', 2), dcfg.get('augment', True),
        dcfg.get('remove_whitespace', True), dcfg.get('normalize_unicode', True),
    )
    train_loader = dm.train_dataloader(seed=seed)
    limit = tcfg.get('limit_train_batches', 1.0)
    steps_per_epoch = max(1, int(len(train_loader) * limit))
    total_steps = tcfg.get('max_steps') or steps_per_epoch * tcfg.get('max_epochs', 20)
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    val_interval = tcfg.get('val_check_interval', 1000)

    n_devices = min(tcfg.get('devices', 1), len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_devices])
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P('data'))

    ocfg = optim.OptimConfig(
        lr=mcfg['lr'], weight_decay=mcfg.get('weight_decay', 0.0),
        warmup_pct=mcfg.get('warmup_pct', 0.075),
        batch_size=dm.batch_size, grad_clip=tcfg.get('gradient_clip_val', 20.0),
        total_steps=total_steps, num_devices=n_devices,
        swa=tcfg.get('swa', True),
    )
    tx, sched = optim.make_optimizer(ocfg, bundle.params)
    state = {'params': bundle.params, 'opt_state': tx.init(bundle.params),
             'step': jnp.zeros((), jnp.int32)}
    state = jax.device_put(state, repl)
    swa_start = int(ocfg.swa_epoch_start * total_steps) if ocfg.swa else total_steps
    swa_state = None

    from parseq_tpu.train.steps import make_train_step

    train_step = jax.jit(
        make_train_step(cfg, tx, compute_dtype),
        in_shardings=(repl, data_sh, data_sh, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    val_step = jax.jit(
        lambda params, images, tgt: parseq.logits_loss(params, cfg, images, tgt, dtype=compute_dtype),
        in_shardings=(repl, data_sh, data_sh),
    )

    perm_rng = np.random.default_rng(seed)
    base_rng = jax.device_put(jax.random.key(seed), repl)

    def validate(params):
        total = BatchResult()
        for images, labels, valid in dm.val_dataloader():
            tgt = tok.encode(labels + [''] * (images.shape[0] - len(labels)), cfg.max_label_length)
            logits, loss, numel = val_step(params, jnp.asarray(images), jnp.asarray(tgt))
            probs = jax.nn.softmax(logits, axis=-1)
            total.add(score_batch(tok, bundle.charset_adapter, jax.device_get(probs),
                                  labels, valid, float(loss), int(numel)))
        res = summarize('val', total)
        val_loss = total.loss / max(total.loss_numel, 1)
        return res, val_loss

    step = 0
    t_start = time.time()
    best_path = None
    log.info(f'training: {total_steps} steps, {steps_per_epoch}/epoch, mesh={n_devices}dev')
    for epoch in range(10 ** 9):
        if step >= total_steps:
            break
        train_loader.set_epoch(epoch)
        for bi, (images, labels, valid) in enumerate(train_loader):
            if step >= total_steps or bi >= steps_per_epoch:
                break
            tgt = tok.encode(labels, cfg.max_label_length)
            perms = parseq.gen_tgt_perms(perm_rng, cfg)
            state, metrics = train_step(
                state,
                jax.device_put(jnp.asarray(images), data_sh),
                jax.device_put(jnp.asarray(tgt), data_sh),
                jax.device_put(jnp.asarray(perms), repl),
                base_rng,
            )
            step += 1
            if step % 50 == 0 or step == 1:
                m = jax.device_get(metrics)
                jlog.log(step=step, epoch=epoch, loss=float(m['loss']),
                         grad_norm=float(m['grad_norm']), lr=float(sched(step)),
                         wall=round(time.time() - t_start, 1))
            if step % val_interval == 0 or step == total_steps:
                res, val_loss = validate(state['params'])
                jlog.log(step=step, val_accuracy=res.accuracy, val_NED=res.ned,
                         val_loss=float(val_loss), val_confidence=res.confidence)
                log.info(f'step {step}: val_acc={res.accuracy:.2f} NED={res.ned:.2f} loss={val_loss:.4f}')
                best_path = save_topk(work_dir / 'checkpoints', step, res.accuracy,
                                      jax.device_get(state['params']), cfg,
                                      meta={'name': mcfg.get('name', 'parseq'),
                                            'model_config': mcfg}, k=3)
            if ocfg.swa and step >= swa_start and (step - swa_start) % steps_per_epoch == 0:
                if swa_state is None:
                    swa_state = optim.swa_init(state['params'])
                swa_state = optim.swa_update(swa_state, state['params'])

    if swa_state is not None and int(jax.device_get(swa_state['n'])) > 0:
        save_checkpoint(work_dir / 'checkpoints' / 'swa.ckpt',
                        jax.device_get(swa_state['avg']), cfg,
                        meta={'name': mcfg.get('name', 'parseq'), 'model_config': mcfg, 'swa': True})
    return state, best_path
