"""Static FLOP counting by walking the jaxpr (fvcore-equivalent).

The reference bench reports fvcore's static analysis
(/root/reference/bench.py:27-50, README.md:220-227: PARSeq-S = 3.255 G at
batch 1). XLA's compiled-HLO `cost_analysis()` undercounts models whose
layers run under `lax.scan` — the loop body is costed once, not
trip-count times (measured: PARSeq-S batch-1 came out 0.718 G). This
counter recurses through scan (x length), pjit/closed calls, custom-vjp
and cond, so scanned encoders/decoders are counted fully.

Convention: fvcore counts one multiply-accumulate as one FLOP for
matmul/conv; we match it so numbers are directly comparable with the
reference README table.
"""

from __future__ import annotations

import math

import jax


def count_flops(fn, *args, **kwargs) -> float:
    """Trace ``fn(*args, **kwargs)`` and return its static FLOP count."""
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return float(_count_jaxpr(jaxpr.jaxpr))


def _prod(xs):
    return math.prod(int(x) for x in xs)


def _dot_flops(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, _rb) = eqn.params['dimension_numbers']
    K = _prod(lhs.shape[i] for i in lc)
    B = _prod(lhs.shape[i] for i in lb)
    M = _prod(lhs.shape[i] for i in range(len(lhs.shape)) if i not in set(lc) | set(lb))
    N = _prod(rhs.shape[i] for i in range(len(rhs.shape)) if i not in set(rc) | set(_rb))
    return B * M * N * K  # MACs, fvcore convention


def _conv_flops(eqn):
    # MACs = out elements x kernel spatial taps x input channels per group
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # kernel
    dn = eqn.params['dimension_numbers']
    k_spatial = _prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    cin_per_group = int(rhs.shape[dn.rhs_spec[1]])
    return _prod(out.shape) * k_spatial * cin_per_group


def _sub_jaxprs(eqn):
    """(multiplier, jaxpr) pairs for control-flow/call primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == 'scan':
        return [(int(p['length']), p['jaxpr'].jaxpr)]
    if name == 'while':
        # trip count is dynamic; cost the body once (matches fvcore's
        # inability to see dynamic loops; default model paths use scan)
        return [(1, p['body_jaxpr'].jaxpr)]
    if name == 'cond':
        # cost the most expensive branch
        branches = [b.jaxpr for b in p['branches']]
        counts = [_count_jaxpr(b) for b in branches]
        best = branches[counts.index(max(counts))]
        return [(1, best)]
    for key in ('jaxpr', 'call_jaxpr', 'fun_jaxpr'):
        if key in p:
            j = p[key]
            return [(1, j.jaxpr if hasattr(j, 'jaxpr') else j)]
    return []


def _count_jaxpr(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == 'dot_general':
            total += _dot_flops(eqn)
        elif name == 'conv_general_dilated':
            total += _conv_flops(eqn)
        else:
            for mult, sub in _sub_jaxprs(eqn):
                total += mult * _count_jaxpr(sub)
    return total
