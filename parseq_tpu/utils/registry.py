"""Model registry: experiment name -> config + params + inference bundle.

Mirrors the reference loader (/root/reference/strhub/models/utils.py:47-93):
model class chosen by key substring, config composed from the YAML groups,
checkpoints loaded from our native format or converted from reference
PyTorch .pt/.ckpt files.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from parseq_tpu.data import CharsetAdapter, CTCTokenizer, Tokenizer
from parseq_tpu.utils import config as config_lib


class InvalidModelError(RuntimeError):
    pass


@dataclass
class ModelBundle:
    """Everything needed to run a model: config, params, tokenizer, forward."""

    name: str
    cfg: Any
    params: Any
    tokenizer: Any
    charset_adapter: CharsetAdapter
    forward_fn: Callable  # (params, images_nhwc_f32) -> logits (B, L, C) f32
    raw_config: dict = field(default_factory=dict)
    _jitted: Callable = None

    def __call__(self, images):
        if self._jitted is None:
            self._jitted = jax.jit(self.forward_fn)
        return self._jitted(self.params, images)

    @property
    def img_size(self):
        return tuple(self.raw_config.get('img_size', (32, 128)))

    def read(self, images):
        """images (B, H, W, 3) in [-1,1] -> (labels, confidences)."""
        logits = self(images)
        probs = jax.nn.softmax(logits, axis=-1)
        labels, probs = self.tokenizer.decode(jax.device_get(probs))
        import numpy as np

        conf = [float(np.prod(p)) for p in probs]
        return labels, conf


def _family(name: str) -> str:
    for key in ('abinet', 'crnn', 'parseq', 'trbc', 'trba', 'vitstr'):
        if key in name:
            return key
    raise InvalidModelError(f"Unable to find model family for '{name}'")


# Trainer-level keys that legitimately live in the model config node
# (reference hydra layout: model.lr / model.batch_size etc. feed the
# trainer, not the network — configs/model/*.yaml).
_TRAINER_KEYS = frozenset({
    'name', 'lr', 'l_lr', 'batch_size', 'weight_decay', 'warmup_pct',
    'charset_train', 'charset_test', 'lm_only',
})


class _TrackedCfg(dict):
    """Dict view that records which keys a family builder consumed.

    Every model.* key must be consumed by the builder or be a known
    trainer key — otherwise creation fails loudly. A silently-dropped
    key is worse than an error: `model.bulk_bits_uint8=true` no-opped
    through a full e2e training run in round 5 because the builder's
    explicit field list didn't include it (the reference's hydra structs
    reject unknown fields for the same reason)."""

    def __init__(self, d):
        super().__init__(d)
        self.consumed = set()

    def get(self, key, default=None):
        self.consumed.add(key)
        return super().get(key, default)

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def _build_parseq(model_cfg: dict, dtype=jnp.bfloat16):
    from parseq_tpu.models import parseq

    charset = model_cfg['charset_train']
    tok = Tokenizer(charset)
    cfg = parseq.PARSeqConfig(
        num_tokens=len(tok),
        max_label_length=model_cfg.get('max_label_length', 25),
        img_size=tuple(model_cfg.get('img_size', (32, 128))),
        patch_size=tuple(model_cfg.get('patch_size', (4, 8))),
        embed_dim=model_cfg.get('embed_dim', 384),
        enc_num_heads=model_cfg.get('enc_num_heads', 6),
        enc_mlp_ratio=model_cfg.get('enc_mlp_ratio', 4),
        enc_depth=model_cfg.get('enc_depth', 12),
        dec_num_heads=model_cfg.get('dec_num_heads', 12),
        dec_mlp_ratio=model_cfg.get('dec_mlp_ratio', 4),
        dec_depth=model_cfg.get('dec_depth', 1),
        decode_ar=model_cfg.get('decode_ar', True),
        refine_iters=model_cfg.get('refine_iters', 1),
        dropout=model_cfg.get('dropout', 0.1),
        perm_num=model_cfg.get('perm_num', 6),
        perm_forward=model_cfg.get('perm_forward', True),
        perm_mirrored=model_cfg.get('perm_mirrored', True),
        # Training dropout-mask levers (PARSeqConfig docstrings / PERF.md);
        # config-settable so `model.bulk_bits_uint8=true` style overrides
        # actually reach the model.
        shared_perm_dropout=model_cfg.get('shared_perm_dropout', False),
        bulk_dropout_bits=model_cfg.get('bulk_dropout_bits', True),
        bulk_bits_uint8=model_cfg.get('bulk_bits_uint8', True),
    )

    def forward_fn(params, images):
        return parseq.forward(params, cfg, images, dtype=dtype)

    def init_fn(key):
        return parseq.init(key, cfg)

    def convert_fn(sd):
        from parseq_tpu.utils.torch_convert import convert_parseq, strip_prefix

        if any(k.startswith('model.') for k in sd):
            sd = strip_prefix(sd, 'model.')
        return convert_parseq(sd)

    return cfg, tok, forward_fn, init_fn, convert_fn


def _build_vitstr(model_cfg: dict, dtype=jnp.bfloat16):
    from parseq_tpu.models import vitstr

    charset = model_cfg['charset_train']
    tok = Tokenizer(charset)
    cfg = vitstr.ViTSTRConfig(
        num_tokens=len(tok),
        max_label_length=model_cfg.get('max_label_length', 25),
        img_size=tuple(model_cfg.get('img_size', (224, 224))),
        patch_size=tuple(model_cfg.get('patch_size', (16, 16))),
        embed_dim=model_cfg.get('embed_dim', 384),
        num_heads=model_cfg.get('num_heads', 6),
        depth=model_cfg.get('depth', 12),
    )

    def forward_fn(params, images):
        return vitstr.forward(params, cfg, images, dtype=dtype)

    def init_fn(key):
        return vitstr.init(key, cfg)

    def convert_fn(sd):
        from parseq_tpu.utils.torch_convert import convert_vitstr, strip_prefix

        if any(k.startswith('model.') for k in sd):
            sd = strip_prefix(sd, 'model.')
        return convert_vitstr(sd)

    return cfg, tok, forward_fn, init_fn, convert_fn


def _build_crnn(model_cfg: dict, dtype=jnp.bfloat16):
    from parseq_tpu.models import crnn

    charset = model_cfg['charset_train']
    tok = CTCTokenizer(charset)
    cfg = crnn.CRNNConfig(
        num_tokens=len(tok),
        max_label_length=model_cfg.get('max_label_length', 25),
        img_size=tuple(model_cfg.get('img_size', (32, 128))),
        hidden_size=model_cfg.get('hidden_size', 256),
        leaky_relu=model_cfg.get('leaky_relu', False),
    )

    def forward_fn(tree, images):
        logits, _ = crnn.forward(tree['params'], tree['stats'], cfg, images, dtype=dtype)
        return logits

    def init_fn(key):
        params, stats = crnn.init(key, cfg)
        return {'params': params, 'stats': stats}

    def convert_fn(sd):
        from parseq_tpu.utils.torch_convert import convert_crnn, strip_prefix

        if any(k.startswith('model.') for k in sd):
            sd = strip_prefix(sd, 'model.')
        params, stats = convert_crnn(sd)
        return {'params': params, 'stats': stats}

    return cfg, tok, forward_fn, init_fn, convert_fn


def _build_trba(model_cfg: dict, dtype=jnp.bfloat16, use_ctc=False):
    from parseq_tpu.models import trba

    charset = model_cfg['charset_train']
    tok = CTCTokenizer(charset) if use_ctc else Tokenizer(charset)
    cfg = trba.TRBAConfig(
        num_tokens=len(tok),
        max_label_length=model_cfg.get('max_label_length', 25),
        img_size=tuple(model_cfg.get('img_size', (32, 128))),
        num_fiducial=model_cfg.get('num_fiducial', 20),
        output_channel=model_cfg.get('output_channel', 512),
        hidden_size=model_cfg.get('hidden_size', 256),
        use_ctc=use_ctc,
    )
    constants = trba.tps_constants(cfg)

    def forward_fn(tree, images):
        logits, _ = trba.forward(tree['params'], tree['stats'], cfg, images,
                                 dtype=dtype, constants=constants)
        return logits

    def init_fn(key):
        params, stats = trba.init(key, cfg)
        return {'params': params, 'stats': stats}

    def convert_fn(sd):
        from parseq_tpu.utils.torch_convert import convert_trba, strip_prefix

        if any(k.startswith('model.') for k in sd):
            sd = strip_prefix(sd, 'model.')
        params, stats = convert_trba(sd, use_ctc=use_ctc)
        return {'params': params, 'stats': stats}

    return cfg, tok, forward_fn, init_fn, convert_fn


def _build_abinet(model_cfg: dict, dtype=jnp.bfloat16):
    from parseq_tpu.models import abinet

    charset = model_cfg['charset_train']
    tok = Tokenizer(charset)
    cfg = abinet.ABINetConfig(
        num_tokens=len(tok),
        max_label_length=model_cfg.get('max_label_length', 25),
        img_size=tuple(model_cfg.get('img_size', (32, 128))),
        d_model=model_cfg.get('d_model', 512),
        nhead=model_cfg.get('nhead', 8),
        d_inner=model_cfg.get('d_inner', 2048),
        dropout=model_cfg.get('dropout', 0.1),
        activation=model_cfg.get('activation', 'relu'),
        v_backbone=model_cfg.get('v_backbone', 'transformer'),
        v_num_layers=model_cfg.get('v_num_layers', 3),
        v_attention=model_cfg.get('v_attention', 'position'),
        v_attention_mode=model_cfg.get('v_attention_mode', 'nearest'),
        l_num_layers=model_cfg.get('l_num_layers', 4),
        l_use_self_attn=model_cfg.get('l_use_self_attn', False),
        l_detach=model_cfg.get('l_detach', True),
        iter_size=model_cfg.get('iter_size', 3),
        v_loss_weight=model_cfg.get('v_loss_weight', 1.0),
        l_loss_weight=model_cfg.get('l_loss_weight', 1.0),
        a_loss_weight=model_cfg.get('a_loss_weight', 1.0),
    )

    def forward_fn(tree, images):
        return abinet.inference_logits(tree['params'], tree['stats'], cfg, images, dtype=dtype)

    def init_fn(key):
        params, stats = abinet.init(key, cfg)
        return {'params': params, 'stats': stats}

    def convert_fn(sd):
        from parseq_tpu.utils.torch_convert import convert_abinet, strip_prefix

        if any(k.startswith('model.') for k in sd):
            sd = strip_prefix(sd, 'model.')
        params, stats = convert_abinet(sd)
        return {'params': params, 'stats': stats}

    return cfg, tok, forward_fn, init_fn, convert_fn


_BUILDERS = {
    'parseq': _build_parseq,
    'vitstr': _build_vitstr,
    'crnn': _build_crnn,
    'trba': _build_trba,
    'trbc': lambda cfg, dtype=jnp.bfloat16: _build_trba(cfg, dtype, use_ctc=True),
    'abinet': _build_abinet,
}


def create_model(experiment: str, *, seed: int = 0, dtype=jnp.bfloat16,
                 config_root=None, **kwargs) -> ModelBundle:
    """Compose config for `experiment` and initialize a fresh model."""
    full = config_lib.compose(experiment, config_root=config_root)
    model_cfg = dict(full['model'])
    model_cfg.update(kwargs)
    return _bundle(experiment, model_cfg, seed=seed, dtype=dtype)


def _bundle(name, model_cfg, *, seed=0, dtype=jnp.bfloat16, params=None, torch_sd=None):
    family = _family(name)
    if family not in _BUILDERS:
        raise InvalidModelError(
            f"Model family '{family}' is not implemented yet (available: {sorted(_BUILDERS)})"
        )
    tracked = _TrackedCfg(model_cfg)
    cfg, tok, forward_fn, init_fn, convert_fn = _BUILDERS[family](tracked, dtype)
    unknown = set(model_cfg) - tracked.consumed - _TRAINER_KEYS
    if unknown:
        raise InvalidModelError(
            f"Unknown model config key(s) for family '{family}': "
            f"{sorted(unknown)}. Accepted model keys: "
            f"{sorted(tracked.consumed)}; trainer-level keys: "
            f"{sorted(_TRAINER_KEYS)}. (Refusing to silently drop them — "
            f"an ignored override trains a different model than requested.)")
    if params is None:
        params = convert_fn(torch_sd) if torch_sd is not None else init_fn(jax.random.key(seed))
    adapter = CharsetAdapter(model_cfg.get('charset_test') or model_cfg['charset_train'])
    return ModelBundle(
        name=model_cfg.get('name', name), cfg=cfg, params=params, tokenizer=tok,
        charset_adapter=adapter, forward_fn=forward_fn, raw_config=model_cfg,
    )


def load_from_checkpoint(path: str, *, dtype=jnp.bfloat16, config_root=None, **kwargs) -> ModelBundle:
    """Load a model from:
    - our native .ckpt (msgpack, includes config), or
    - a reference PyTorch .pt/.ckpt (converted; model family from filename).
    """
    if path.startswith('pretrained='):
        # reference test.py/read.py accept `pretrained=<experiment>` as the
        # checkpoint argument (strhub/models/utils.py:86-90)
        from parseq_tpu.utils.pretrained import load_pretrained

        return load_pretrained(path.split('=', 1)[1], dtype=dtype, **kwargs)

    if path.endswith('.pt') or _looks_like_torch(path):
        from parseq_tpu.utils.torch_convert import load_torch_state_dict

        sd = load_torch_state_dict(path)
        name = _family_from_path(path)
        full = config_lib.compose(name if name != 'parseq' else 'parseq', config_root=config_root)
        model_cfg = dict(full['model'])
        model_cfg.update(kwargs)
        return _bundle(name, model_cfg, dtype=dtype, torch_sd=sd)

    from parseq_tpu.utils.checkpoint import load_checkpoint

    params, cfg_dict, meta = load_checkpoint(path)
    model_cfg = dict(meta.get('model_config') or {})
    model_cfg.update(kwargs)
    name = meta.get('name') or model_cfg.get('name') or 'parseq'
    return _bundle(name, model_cfg, dtype=dtype, params=params)


def _family_from_path(path: str) -> str:
    import os

    base = os.path.basename(path).lower()
    return _family(base)


def _looks_like_torch(path: str) -> bool:
    try:
        with open(path, 'rb') as f:
            magic = f.read(4)
        return magic[:2] == b'PK' or magic == b'\x80\x02'.ljust(4, b'\x00')[:4]
    except OSError:
        return False
