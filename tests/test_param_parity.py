"""Exact parameter-count parity with the reference's published numbers
(README.md:220-227 via fvcore): total 23.833 M, encoder 21.381 M,
decoder 2.368 M, head 36.575 K, text_embed 37.248 K."""

import jax

from parseq_tpu.models import parseq
from parseq_tpu.ops.layers import count_params


def test_parseq_s_param_counts_match_reference():
    cfg = parseq.PARSeqConfig(num_tokens=97)  # 94-charset
    p = parseq.init(jax.random.key(0), cfg)
    assert count_params(p) == 23_832_671  # 23.833 M
    assert count_params(p['encoder']) == 21_380_736  # 21.381 M
    assert count_params(p['decoder']) == 2_368_128  # 2.368 M
    assert count_params(p['head']) == 36_575
    assert count_params(p['text_embed']) == 37_248
    assert p['pos_queries'].size == 26 * 384
