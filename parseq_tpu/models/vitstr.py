"""ViTSTR: plain ViT with per-position character classification.

Reference: /root/reference/strhub/models/vitstr/model.py:14-28 and
system.py:49-85 — a timm VisionTransformer (with class token) whose first
``max_label_length + 2`` output tokens go through a shared linear head; the
leading (class-token) position is discarded, yielding the same
``(B, max_label_length + 1, num_classes)`` logits contract as PARSeq.
Single parallel forward pass — no decoding loop at all (ideal for TPU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from parseq_tpu.models import vit
from parseq_tpu.models.vit import ViTConfig
from parseq_tpu.ops import layers
from parseq_tpu.ops.layers import linear


@dataclass(frozen=True)
class ViTSTRConfig:
    num_tokens: int = 97
    max_label_length: int = 25
    img_size: tuple[int, int] = (224, 224)
    patch_size: tuple[int, int] = (16, 16)
    embed_dim: int = 384
    num_heads: int = 6
    depth: int = 12
    mlp_ratio: float = 4.0

    @property
    def vit(self) -> ViTConfig:
        return ViTConfig(img_size=self.img_size, patch_size=self.patch_size,
                         embed_dim=self.embed_dim, depth=self.depth,
                         num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                         class_token=True)

    @property
    def num_classes(self) -> int:
        return self.num_tokens - 2  # BOS/PAD never predicted

    @property
    def num_steps(self) -> int:
        return self.max_label_length + 1

    @property
    def eos_id(self) -> int:
        return 0

    @property
    def pad_id(self) -> int:
        return self.num_tokens - 1


def init(key, cfg: ViTSTRConfig):
    k_vit, k_head = jax.random.split(key)
    return {
        'encoder': vit.init(k_vit, cfg.vit),
        'head': layers.linear_init(k_head, cfg.embed_dim, cfg.num_classes),
    }


def forward(params, cfg: ViTSTRConfig, images, dtype=jnp.float32):
    """(B, H, W, 3) -> logits (B, max_label_length + 1, num_classes)."""
    x = vit.apply(params['encoder'], images.astype(dtype), cfg.vit)
    # First (max_label_length + 2) tokens, then drop the class-token position.
    x = x[:, 1 : cfg.max_label_length + 2]
    return linear(params['head'], x).astype(jnp.float32)


def logits_loss(params, cfg: ViTSTRConfig, images, tgt_ids, dtype=jnp.float32):
    """CE loss vs [chars..., EOS, PAD...] with PAD ignored (base.py:194-201).
    Used for both training (vitstr/system.py:81-85) and validation."""
    logits = forward(params, cfg, images, dtype=dtype)
    targets = tgt_ids[:, 1 : cfg.num_steps + 1]  # drop BOS
    valid = targets != cfg.pad_id
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_safe = jnp.clip(targets, 0, cfg.num_classes - 1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    numel = jnp.sum(valid)
    loss = jnp.sum(nll * valid) / jnp.maximum(numel, 1)
    return logits, loss, numel
