"""Formulation-FLOP tally: separate device work from model math.

This framework replaces data-dependent gathers/scatters with one-hot MXU
matmuls and dense slot-incidence contractions (ops/gather.py, nn/hgconv.py —
the round-1 design decision that removed XLA's near-serial TPU scatters).
Those matmuls do real device work but are not part of the model's
algorithmic FLOPs: rating MFU on XLA's total op count lets a method look
"efficient" by inflating its own denominator (VERDICT round-3 weak #5 —
SE3's 22 TF/step vs equiformer's 2.8 for a similar-size model).

Instrumented call sites add their analytic FLOP cost here AT TRACE TIME
(shapes are static under jit; the Python executes once per compile). The
bench enables the tally around the first step trace and reports

    formulation_tflops = tallied one-hot / incidence contraction FLOPs
    algorithmic_tflops = XLA total − formulation

with two MFU columns (PERF.md "Split MFU accounting").

Cost model per call site: an einsum against a CONSTANT one-hot/incidence
operand costs 2·prod(index extents) forward; its autodiff transpose is one
same-shaped matmul (the one-hot is constant, so only the data operand gets
a cotangent) — call sites on the forward path tally factor=2, call sites
inside custom-VJP backward functions tally factor=1 (their Python runs
during the backward trace itself).
"""

from __future__ import annotations

import numpy as np

_enabled = False
_total = 0.0


def enable() -> None:
    global _enabled, _total
    _enabled = True
    _total = 0.0


def disable() -> None:
    global _enabled
    _enabled = False


def total() -> float:
    """Tallied FLOPs since enable() (fwd+bwd, per the factor convention)."""
    return _total


def add(flops: float) -> None:
    if _enabled:
        global _total
        _total += float(flops)


def einsum_flops(spec: str, *operands) -> float:
    """2 × prod of extents of the union of indices in a 2+-operand einsum."""
    lhs = spec.split("->")[0]
    terms = lhs.split(",")
    dims: dict[str, int] = {}
    for term, op in zip(terms, operands):
        for ch, n in zip(term, np.shape(op)):
            dims[ch] = int(n)
    out = 2.0
    for n in dims.values():
        out *= n
    return out


def tally_einsum(spec: str, *operands, factor: int = 2):
    """Tally an einsum's analytic cost (× factor) and return jnp.einsum."""
    import jax.numpy as jnp

    add(factor * einsum_flops(spec, *operands))
    return jnp.einsum(spec, *operands)
