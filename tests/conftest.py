"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (real TPU tunnel), so env vars set here are too late for
platform selection — use jax.config.update instead. XLA_FLAGS still works
because the CPU client is created lazily, on first use.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
# NOTE: we deliberately do NOT enable the persistent compilation cache here:
# XLA:CPU AOT deserialization warns about machine-feature mismatches
# (+prefer-no-scatter/-gather) with possible SIGILL on this runner.
