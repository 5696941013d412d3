"""parseq_tpu — a TPU-native scene-text-recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of baudm/parseq
(reference: /root/reference). Models are pure functions over parameter pytrees,
all shapes are static (XLA-friendly), decoding loops are `lax.scan`s, and
multi-device execution is SPMD over a `jax.sharding.Mesh`.

Layout:
    parseq_tpu.data      charsets, tokenizers, LMDB datasets, transforms
    parseq_tpu.ops       core neural-net ops (attention, layernorm, CTC, ...)
    parseq_tpu.models    model families: PARSeq, ViTSTR, CRNN, TRBA, ABINet
    parseq_tpu.train     optimizer/schedule/SWA, train+eval loops
    parseq_tpu.parallel  mesh + sharding helpers
    parseq_tpu.utils     config system, checkpoint I/O, torch conversion
    parseq_tpu.cli       train/test/read/bench/tune entry points
"""

__version__ = '0.1.0'
