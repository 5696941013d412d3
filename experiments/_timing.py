"""Slope-based on-chip timing for sub-10ms ops under the axon relay.

Why: block_until_ready does not synchronize remote execution under the
relay, and per-call timing of independent small ops has produced
physically impossible numbers (implied >6x chip peak; see
relay_timing_calibration.py, PERF.md "Timing methodology"). The trusted
pattern is:

  1. run the op N times INSIDE one jitted lax.scan, with per-iteration
     input variation so no iteration is dead or CSE-able,
  2. force execution by fetching a float() scalar that depends on every
     iteration,
  3. time at two scan lengths and take the slope — dispatch, RTT, fetch
     and compile constants cancel exactly.

Calibration: 4096^3 bf16 matmul chain measures 180.9 TFLOP/s (~92% of
v5e peak) with this harness vs 68-83 TFLOP/s with whole-call timings.
"""

import statistics
import time

import jax
import jax.numpy as jnp


def slope_ms(body, n1=10, n2=40, trials=5, key_impl=None):
    """body(i, key) -> scalar contribution for iteration i (traced int32).

    Returns median ms per iteration. `body` must consume `i` (or `key`) so
    iterations differ, and its return must depend on the full computation.
    key_impl: pass 'unsafe_rbg' when timing dropout paths — the production
    train loop uses hardware-RNG keys (train/loop.py:259-262) and threefry
    vs rbg changes dropout cost materially.
    """

    def make(n):
        @jax.jit
        def run(key):
            def step(carry, i):
                acc, k = carry
                return (acc + body(i, jax.random.fold_in(k, i)), k), None
            (acc, _), _ = jax.lax.scan(
                step, (jnp.zeros((), jnp.float32), key), jnp.arange(n), length=n)
            return acc
        return run

    def mk_key(x):
        return jax.random.key(x, impl=key_impl) if key_impl else jax.random.key(x)

    f1, f2 = make(n1), make(n2)
    float(f1(mk_key(0)))
    float(f2(mk_key(0)))

    def med(f):
        ts = []
        for t in range(trials):
            k = mk_key(100 + t)
            t0 = time.perf_counter()
            float(f(k))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return (med(f2) - med(f1)) / (n2 - n1) * 1e3
