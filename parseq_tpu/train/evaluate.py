"""Evaluation: accuracy / NED / confidence accumulation + results tables.

Reference semantics: strhub/models/base.py:112-164 (_eval_step and
aggregation) and test.py:30-66 (Result, print_results_table).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax

from parseq_tpu.utils.metrics import ned_batch


@dataclass
class BatchResult:
    num_samples: int = 0
    correct: int = 0
    ned: float = 0.0
    confidence: float = 0.0
    label_length: int = 0
    loss: float = 0.0
    loss_numel: int = 0

    def add(self, other: 'BatchResult'):
        self.num_samples += other.num_samples
        self.correct += other.correct
        self.ned += other.ned
        self.confidence += other.confidence
        self.label_length += other.label_length
        self.loss += other.loss * other.loss_numel
        self.loss_numel += other.loss_numel


@dataclass
class Result:
    dataset: str
    num_samples: int
    accuracy: float
    ned: float
    confidence: float
    label_length: float


def score_decoded(charset_adapter, preds, pred_probs, labels, valid=None,
                  loss=0.0, loss_numel=0) -> BatchResult:
    """Score already-decoded predictions against ground truth.

    Edit distances run through the native batch core
    (utils.metrics.ned_batch) — per-sample Python loops were host-bound at
    TPU throughput.
    """
    r = BatchResult(loss=float(loss), loss_numel=int(loss_numel))
    keep = [i for i in range(len(labels)) if valid is None or valid[i]]
    kept_preds = [charset_adapter(preds[i]) for i in keep]
    kept_gts = [labels[i] for i in keep]
    neds = ned_batch(kept_preds, kept_gts)
    for pred, gt, nd, i in zip(kept_preds, kept_gts, neds, keep):
        r.confidence += float(np.prod(pred_probs[i]))
        r.ned += float(nd)
        if pred == gt:
            r.correct += 1
        r.num_samples += 1
        r.label_length += len(pred)
    return r


def score_batch(tokenizer, charset_adapter, probs, labels, valid=None,
                loss=0.0, loss_numel=0) -> BatchResult:
    """probs: (B, L, C) softmax outputs; labels: list[str] ground truth."""
    preds, pred_probs = tokenizer.decode(np.asarray(probs))
    return score_decoded(charset_adapter, preds, pred_probs, labels, valid,
                         loss, loss_numel)


@jax.jit
def _normalize_u8(x):
    """Jitted wrapper over the shared u8 normalize (steps.normalize_u8)."""
    from parseq_tpu.train.steps import normalize_u8

    return normalize_u8(x)


@jax.jit
def _device_post(logits):
    """softmax/argmax/gather on device so the fetch is ids + picked probs
    (module-level so the jit cache is shared across eval_dataset calls —
    cli/test.py runs one call per benchmark set on identical shapes)."""
    import jax.numpy as jnp

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    conf = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]
    return ids, conf


def eval_dataset(model, loader, name='val', forward=None, depth=8,
                 fetch_group='dataset') -> Result:
    """Run a ModelBundle over a loader; returns the aggregated Result.

    Pipelined: keeps up to `depth` batches in flight so device compute and
    result transfer overlap with host decode/scoring and the next batch's
    load (a synchronous dispatch->fetch per batch pays the full device
    round-trip latency each time — ~15x slower through the axon relay).
    Device-side post-processing (softmax/argmax/gather under jit) shrinks
    the fetched result from the (B, L, C) distribution to ids + picked
    probs.

    fetch_group='dataset' (default): every batch's (ids, conf) stays
    resident on device until the loader is exhausted, then ONE concatenated
    fetch moves the whole dataset's results — a benchmark set is only
    ~100s of KB, so a single transfer beats dozens of per-group round trips
    (relay RTT0 ~13-42 ms dominates small fetches; sweep in
    experiments/eval_relay_sweep.py). An integer fetch_group restores
    grouped draining every `depth` batches (bounded device result memory —
    use for very large datasets or tiny-memory configs).
    """
    import collections

    import jax.numpy as jnp

    fwd = forward or model
    post = _device_post
    total = BatchResult()
    inflight = collections.deque()
    whole = fetch_group == 'dataset'

    def drain_group():
        take = len(inflight) if whole else max(1, min(fetch_group, len(inflight)))
        items = [inflight.popleft() for _ in range(take)]
        if take == 1:
            ids, conf = jax.device_get(items[0][0])
        else:
            # concat on device -> a single 2-buffer fetch for the whole group
            ids, conf = jax.device_get(
                (jnp.concatenate([it[0][0] for it in items]),
                 jnp.concatenate([it[0][1] for it in items])))
        off = 0
        for _, labels, valid in items:
            b = len(valid)
            preds, pred_probs = model.tokenizer.decode_ids(
                ids[off:off + b], conf[off:off + b])
            off += b
            total.add(score_decoded(model.charset_adapter, preds, pred_probs,
                                    labels, valid))

    for images, labels, valid in loader:
        if images.dtype == np.uint8:
            images = _normalize_u8(images)
        inflight.append((post(fwd(images)), labels, valid))
        if not whole and len(inflight) >= depth:
            drain_group()
    while inflight:
        drain_group()
    return summarize(name, total)


def summarize(name: str, t: BatchResult) -> Result:
    n = max(t.num_samples, 1)
    return Result(
        dataset=name,
        num_samples=t.num_samples,
        accuracy=100.0 * t.correct / n,
        ned=100.0 * (1 - t.ned / n),
        confidence=100.0 * t.confidence / n,
        label_length=t.label_length / n,
    )


def print_results_table(results: list[Result], file=None):
    """Markdown results table, reference format (test.py:40-66)."""
    w = max([len(r.dataset) for r in results] + [len('Dataset'), len('Combined')])
    print('| {:<{w}} | # samples | Accuracy | 1 - NED | Confidence | Label Length |'.format('Dataset', w=w), file=file)
    print('|:{:-<{w}}:|----------:|---------:|--------:|-----------:|-------------:|'.format('----', w=w), file=file)
    c = Result('Combined', 0, 0.0, 0.0, 0.0, 0.0)
    for res in results:
        c.num_samples += res.num_samples
        c.accuracy += res.num_samples * res.accuracy
        c.ned += res.num_samples * res.ned
        c.confidence += res.num_samples * res.confidence
        c.label_length += res.num_samples * res.label_length
        print(
            f'| {res.dataset:<{w}} | {res.num_samples:>9} | {res.accuracy:>8.2f} | {res.ned:>7.2f} '
            f'| {res.confidence:>10.2f} | {res.label_length:>12.2f} |',
            file=file,
        )
    n = max(c.num_samples, 1)
    c.accuracy /= n
    c.ned /= n
    c.confidence /= n
    c.label_length /= n
    print('|-{:-<{w}}-|-----------|----------|---------|------------|--------------|'.format('----', w=w), file=file)
    print(
        f'| {c.dataset:<{w}} | {c.num_samples:>9} | {c.accuracy:>8.2f} | {c.ned:>7.2f} '
        f'| {c.confidence:>10.2f} | {c.label_length:>12.2f} |',
        file=file,
    )
