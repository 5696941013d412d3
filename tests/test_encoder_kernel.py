"""Encoder mega-kernel numerics (interpret mode) + dtype-adaptive GELU policy.

The kernel itself is rejected for production (slower than the scan path —
see ops/encoder_kernel.py STATUS and PERF.md), but it stays correct and
interpret-tested so the measurement can be revisited on future hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parseq_tpu.models import vit
from parseq_tpu.ops import layers
from parseq_tpu.ops.encoder_kernel import (
    _erf, fused_encoder_blocks, stack_block_params)


def test_fused_encoder_blocks_matches_scan():
    cfg = vit.ViTConfig(img_size=(32, 128), patch_size=(4, 8), embed_dim=384,
                        depth=2, num_heads=6)
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, cfg.num_patches, cfg.embed_dim),
                          jnp.bfloat16)

    def scan_blocks(x):
        def body(x, bp):
            return vit.block_apply(bp, x, cfg.num_heads), None
        return jax.lax.scan(body, x, params['blocks'])[0]

    ref = np.asarray(scan_blocks(x), np.float32)
    op = stack_block_params(params['blocks'])
    got = np.asarray(fused_encoder_blocks(op, x, num_heads=cfg.num_heads,
                                          block_b=2, interpret=True), np.float32)
    # bf16 accumulation-order noise only
    assert np.abs(ref - got).max() < 0.12


def test_inkernel_erf_accuracy():
    """A&S 7.1.26 rational erf: ~1.5e-7 approximation error plus f32
    arithmetic rounding — must stay far below bf16 resolution (~8e-3), so
    the kernel's exact-form GELU is faithful."""
    x = jnp.linspace(-5, 5, 10001, dtype=jnp.float32)
    ref = jax.scipy.special.erf(x)
    err = np.abs(np.asarray(_erf(x)) - np.asarray(ref)).max()
    assert err < 1e-6


def test_gelu_dtype_policy():
    """f32 gelu is the exact erf form (torch parity); bf16 uses tanh, whose
    deviation is far below bf16 quantization error (measured 5.0e-4 vs
    1.56e-2 — experiments/gelu_bench.py)."""
    x32 = jnp.linspace(-6, 6, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(layers.gelu(x32)),
                               np.asarray(jax.nn.gelu(x32, approximate=False)),
                               rtol=0, atol=0)
    xb = x32.astype(jnp.bfloat16)
    got = np.asarray(layers.gelu(xb), np.float32)
    exact = np.asarray(jax.nn.gelu(x32, approximate=False), np.float32)
    # bf16-tanh gelu must stay within bf16 quantization distance of exact
    assert np.abs(got - exact).max() < 0.04
