"""ops/flash_bwd.py: interpret-mode gradient parity vs XLA autodiff.

The kernel is default-OFF (ops/attention.py STATUS note: slower than XLA
autodiff on v5e AND the on-chip Mosaic lowering of its transposed
contractions produced wrong grads). These tests pin the math itself so the
kernel stays correct-by-construction if the lowering issue is revisited.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parseq_tpu.ops.flash_bwd import _attn_fwd_ref, attention_flashbwd


@pytest.mark.parametrize('shape', [(4, 3, 16, 8), (2, 6, 128, 64), (3, 2, 24, 16)])
def test_grad_parity_interpret(shape):
    rng = np.random.default_rng(0)
    B, h, L, dh = shape
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(dh)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_attn_fwd_ref(q, k, v, scale)))

    def loss_new(q, k, v):
        return jnp.sum(jnp.sin(attention_flashbwd(q, k, v, scale, True)))

    np.testing.assert_allclose(np.asarray(_attn_fwd_ref(q, k, v, scale)),
                               np.asarray(attention_flashbwd(q, k, v, scale, True)),
                               atol=1e-6)
    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
