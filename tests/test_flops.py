"""utils/flops.py: jaxpr-walk static FLOP counter (fvcore MAC convention)."""

import jax
import jax.numpy as jnp

from parseq_tpu.utils.flops import count_flops


def test_plain_matmul():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert count_flops(lambda x, y: x @ y, a, b) == 8 * 32 * 16


def test_batched_dot_general():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    got = count_flops(lambda x, y: jnp.einsum('bik,bkj->bij', x, y), a, b)
    assert got == 4 * 8 * 32 * 16


def test_scan_multiplies_by_trip_count():
    w = jnp.zeros((12, 16, 16))  # 12 layers stacked

    def fn(x):
        def body(h, wi):
            return h @ wi, None
        out, _ = jax.lax.scan(body, x, w)
        return out

    got = count_flops(fn, jnp.zeros((8, 16)))
    assert got == 12 * 8 * 16 * 16


def test_conv():
    img = jnp.zeros((2, 16, 16, 3))
    ker = jnp.zeros((3, 3, 3, 8))

    def fn(x):
        return jax.lax.conv_general_dilated(
            x, ker, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # out elements (2*16*16*8) x taps (3*3) x cin (3)
    assert count_flops(fn, img) == 2 * 16 * 16 * 8 * 9 * 3


def test_jit_boundary_recursed():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert count_flops(jax.jit(lambda x, y: x @ y), a, b) == 8 * 32 * 16


def test_cond_takes_max_branch():
    a = jnp.zeros((8, 16))
    w1 = jnp.zeros((16, 16))
    w2 = jnp.zeros((16, 64))

    def fn(x):
        return jax.lax.cond(x.sum() > 0, lambda v: (v @ w2).sum(),
                            lambda v: (v @ w1).sum(), x)

    assert count_flops(fn, a) == 8 * 16 * 64
