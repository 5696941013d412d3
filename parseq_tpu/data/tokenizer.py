"""Tokenizers mapping text labels <-> fixed-shape integer id arrays.

Token-id layout matches the reference exactly so converted PyTorch checkpoints
keep their head/embedding row alignment
(/root/reference/strhub/data/utils.py:102-150):

    Tokenizer    : EOS=0, chars=1..N, BOS=N+1, PAD=N+2
    CTCTokenizer : BLANK=0, chars=1..N

TPU-first difference: `encode` returns a *fixed-shape* array padded to
``max_label_length + 2`` (BOS + chars + EOS) instead of the reference's
batch-max `pad_sequence` — static shapes are required under jit, and
pad-id positions are ignored by every loss, so results are identical.
Decoding operates on host numpy (it's string post-processing, not compute).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from itertools import groupby

import numpy as np


class BaseTokenizer(ABC):

    def __init__(self, charset: str, specials_first: tuple = (), specials_last: tuple = ()) -> None:
        self._itos = specials_first + tuple(charset) + specials_last
        self._stoi = {s: i for i, s in enumerate(self._itos)}
        self.charset = charset

    def __len__(self) -> int:
        return len(self._itos)

    def _tok2ids(self, tokens: str) -> list[int]:
        return [self._stoi[s] for s in tokens]

    def _ids2tok(self, token_ids, join: bool = True):
        tokens = [self._itos[int(i)] for i in token_ids]
        return ''.join(tokens) if join else tokens

    @abstractmethod
    def encode(self, labels: list[str], max_label_length: int) -> np.ndarray:
        """Encode a batch of labels into a fixed-shape id array ``(N, L)``."""
        raise NotImplementedError

    @abstractmethod
    def _filter(self, probs: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, list[int]]:
        """Filtering applied prior to decoding (EOS truncation / CTC dedupe)."""
        raise NotImplementedError

    def decode(self, token_dists: np.ndarray, raw: bool = False) -> tuple[list, list[np.ndarray]]:
        """Decode a batch of token probability distributions ``(N, L, C)``.

        Greedy per-position argmax, then tokenizer-specific filtering
        (reference semantics: /root/reference/strhub/data/utils.py:79-99).
        """
        token_dists = np.asarray(token_dists)
        batch_tokens, batch_probs = [], []
        for dist in token_dists:
            ids = dist.argmax(-1)
            probs = np.take_along_axis(dist, ids[:, None], axis=-1)[:, 0]
            if not raw:
                probs, ids = self._filter(probs, ids)
            batch_tokens.append(self._ids2tok(ids, not raw))
            batch_probs.append(probs)
        return batch_tokens, batch_probs


class Tokenizer(BaseTokenizer):
    """BOS/EOS/PAD tokenizer for autoregressive / parallel seq2seq decoding."""

    BOS = '[B]'
    EOS = '[E]'
    PAD = '[P]'

    def __init__(self, charset: str) -> None:
        specials_first = (self.EOS,)
        specials_last = (self.BOS, self.PAD)
        super().__init__(charset, specials_first, specials_last)
        self.eos_id = self._stoi[self.EOS]
        self.bos_id = self._stoi[self.BOS]
        self.pad_id = self._stoi[self.PAD]

    def encode(self, labels: list[str], max_label_length: int) -> np.ndarray:
        """-> int32 ``(N, max_label_length + 2)``: [BOS, chars..., EOS, PAD...]."""
        L = max_label_length + 2
        out = np.full((len(labels), L), self.pad_id, dtype=np.int32)
        for n, label in enumerate(labels):
            ids = self._tok2ids(label)[: max_label_length]
            out[n, 0] = self.bos_id
            out[n, 1 : 1 + len(ids)] = ids
            out[n, 1 + len(ids)] = self.eos_id
        return out

    def _filter(self, probs: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, list[int]]:
        ids = ids.tolist()
        try:
            eos_idx = ids.index(self.eos_id)
        except ValueError:
            eos_idx = len(ids)
        # Truncate after EOS, but keep the EOS probability itself.
        return probs[: eos_idx + 1], ids[:eos_idx]


class CTCTokenizer(BaseTokenizer):
    """BLANK-based tokenizer for CTC models (CRNN, TRBC)."""

    BLANK = '[B]'

    def __init__(self, charset: str) -> None:
        super().__init__(charset, specials_first=(self.BLANK,))
        self.blank_id = self._stoi[self.BLANK]

    def encode(self, labels: list[str], max_label_length: int) -> np.ndarray:
        """-> int32 ``(N, max_label_length)`` padded with BLANK (=0)."""
        out = np.full((len(labels), max_label_length), self.blank_id, dtype=np.int32)
        for n, label in enumerate(labels):
            ids = self._tok2ids(label)[:max_label_length]
            out[n, : len(ids)] = ids
        return out

    def lengths(self, labels: list[str], max_label_length: int) -> np.ndarray:
        return np.asarray([min(len(y), max_label_length) for y in labels], dtype=np.int32)

    def _filter(self, probs: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, list[int]]:
        # Best-path decode: collapse repeats, then drop blanks.
        ids = [k for k, _ in groupby(ids.tolist())]
        ids = [x for x in ids if x != self.blank_id]
        return probs, ids
