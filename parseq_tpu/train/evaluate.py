"""Evaluation: accuracy / NED / confidence accumulation + results tables.

Reference semantics: strhub/models/base.py:112-164 (_eval_step and
aggregation) and test.py:30-66 (Result, print_results_table).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax

from parseq_tpu.utils.metrics import ned as ned_term


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


def score_batch(tokenizer, charset_adapter, probs, labels, valid=None,
                loss=0.0, loss_numel=0) -> BatchResult:
    """probs: (B, L, C) softmax outputs; labels: list[str] ground truth."""
    preds, pred_probs = tokenizer.decode(np.asarray(probs))
    r = BatchResult(loss=float(loss), loss_numel=int(loss_numel))
    for i, gt in enumerate(labels):
        if valid is not None and not valid[i]:
            continue
        pred = charset_adapter(preds[i])
        r.confidence += float(np.prod(pred_probs[i]))
        r.ned += ned_term(pred, gt)
        if pred == gt:
            r.correct += 1
        r.num_samples += 1
        r.label_length += len(pred)
    return r


def eval_dataset(model, loader, name='val', forward=None) -> Result:
    """Run a ModelBundle over a loader; returns the aggregated Result."""
    fwd = forward or model
    total = BatchResult()
    for images, labels, valid in loader:
        logits = fwd(images)
        probs = jax.nn.softmax(logits, axis=-1)
        total.add(score_batch(model.tokenizer, model.charset_adapter,
                              jax.device_get(probs), labels, valid))
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
