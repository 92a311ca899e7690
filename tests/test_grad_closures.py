"""Reverse-mode safety sweep over every cohort-closure variant.

The round-3 regression this pins down: the offset-routing closure
(offsets/offstep on) shipped a bare `jnp.sqrt(m2)` in `_stream_geom`
whose derivative is infinite at the still-cell m2 == 0, and `jax.grad`
of the default coupled step returned all-NaN while the primal stayed
perfectly finite.  Every closure variant must keep the cohort solve
differentiable (the calibration/inversion capability PARITY.md
advertises — the coupled-step grad itself is covered once, at the
default closure, by tests/test_checkpoint.py).  The sweep grads the
cohort solve directly with the REAL fluvial rules and a state holding
exact zeros (still cells, dead streams, zero moments) — the inputs
where un-double-where'd sqrt/rsqrt/pow produce inf * 0 = NaN
cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import soillib_tpu as soil  # noqa: F401  (registers channel layout)
from soillib_tpu.models.erosion import make_fluvial_rules
from soillib_tpu.models.params import ErosionParams
from soillib_tpu.ops.cohort import (
    NSTATE,
    CohortClosure,
    cohort_advance_reference,
)

# The sweep runs EAGERLY (jax.disable_jit): XLA reverse-mode compiles
# of the offsets round body take ~5 min each on CPU while eager
# execution at this size takes seconds — and NaN safety is a property
# of the VALUES, not the compilation.  The default closure's COMPILED
# coupled-step grad is covered by tests/test_checkpoint.py.  Variants
# cover the closure extremes — "everything on" exercises every optional
# code path (uniform marginals, xmom regression, per-stream physics,
# offset-conditional steps) in one run.
CLOSURES = [
    # Legacy dispersion split (the pre-round-3 closure).
    CohortClosure(offsets=False, offstep=False),
    # Offset routing with uniform (legacy) step moments.
    CohortClosure(offsets=True, offstep=False),
    # The round-5 pooled-offstep default (gauss).
    CohortClosure(),
    # The round-4 per-face-stream offstep (the ablation point).
    CohortClosure(offstep="stream"),
    # Everything on at once (covers offstep/uniform/xmom/perstream).
    CohortClosure(offsets=True, offstep=True, vdist="uniform",
                  xmom=True, perstream=True),
    # Face-routed mixture nodes (quality modes).
    CohortClosure(nodes=2),
    CohortClosure(nodes=4),
    # Sign-quadrant routing (round-5 ablation; divides by face weights).
    CohortClosure(nodes=4, node_rule="sign"),
    # Similarity (cluster) routing (round-5 ablation; argmin masks +
    # guarded arrival-mean divisions).
    CohortClosure(nodes=4, node_rule="cluster"),
    # Fast/slow speed-split routing (round-5 ablation).
    CohortClosure(nodes=2, node_rule="speed"),
]


def _ids(c):
    bits = []
    if c.offsets:
        suffix = {"stream": "+stream", True: "+step"}.get(c.offstep, "")
        bits.append("off" + suffix)
    if c.vdist != "gauss":
        bits.append(c.vdist)
    if c.xmom:
        bits.append("xmom")
    if c.perstream:
        bits.append("perstream")
    return "-".join(bits) or "legacy"


def _grad_through_cohort(closure):
    """Gradient of a cohort-transport outcome w.r.t. the velocity field,
    with the real fluvial physics callback and a state that mixes live
    streams with EXACT zeros (weight, moments, offsets)."""
    W = H = 12
    p = ErosionParams()
    rules = make_fluvial_rules(p, 0.1)
    z = jnp.zeros((W, H))
    o = jnp.ones((W, H))
    # Weight only on a diagonal band; the rest of the domain is exactly
    # zero state — dead streams everywhere the band pushes into.
    wgt = jnp.where(jnp.abs(jnp.arange(W)[:, None]
                            - jnp.arange(H)[None, :]) <= 1, 1.0, 0.0)

    def loss(v):
        st = [wgt, wgt * v, 0.3 * wgt * v, wgt * v * v, z, z,
              0.5 * wgt, 0.5 * wgt,
              wgt / 3.0, wgt / 3.0,
              wgt, 0.1 * wgt, wgt * v, z, 0.2 * wgt, 0.2 * wgt, 0.2 * wgt]
        assert len(st) == NSTATE + 7
        # N-node mixtures: births in node 0, the other nodes EXACT-zero
        # ensembles (the degenerate inputs reverse mode must survive).
        st = st + [z] * ((closure.nodes - 1) * len(st))
        aux = [0.05 * o, -0.02 * o, o, -0.1 * o]
        _, G = cohort_advance_reference(st, aux, rules, 4, 0.1,
                                        closure=closure)
        return jnp.sum(G ** 2)

    return np.asarray(jax.grad(loss)(0.4 * o))


@pytest.mark.parametrize("closure", CLOSURES, ids=_ids)
def test_cohort_grad_finite_for_every_closure(closure):
    with jax.disable_jit():
        g = _grad_through_cohort(closure)
    assert np.isfinite(g).all(), f"non-finite gradient for {closure}"
    assert np.abs(g).max() > 0.0
