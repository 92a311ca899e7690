"""Static kernel resource-budget tests (off-TPU guard).

The round-3 regression class this pins down: the cohort state grew
(NSTATE 6 -> 10) while the Pallas window geometry stayed tuned for the
smaller state, and the first real Mosaic compile — the 4096² TPU bench —
VMEM-faulted. Interpret-mode equivalence tests cannot catch that; these
tests check the STATIC footprint model (exact scratch shapes + the
calibrated round-body liveness estimate) against the budget for every
geometry the code would actually use, so channel-count growth fails CI
on CPU before it ever reaches a TPU.
"""

import pytest

from soillib_tpu.ops import cohort
from soillib_tpu.ops.cohort import (
    CohortClosure,
    CohortGeometry,
    VMEM_BUDGET_BYTES,
    choose_geometry,
    cohort_vmem_bytes,
)

# Channel counts of the shipped models (S = NSTATE + C):
#   fluvial: C = 4 carried (+3 albedo), A = 4 aux -> S = 17 (14 no-albedo)
#   debris:  C = 3 carried (+3 albedo), A = 4 aux -> S = 16 (13 no-albedo)
MODEL_CHANNEL_COUNTS = [
    (17, 4, 7),   # fluvial, albedo on
    (14, 4, 4),   # fluvial, albedo off
    (16, 4, 6),   # debris, albedo on
    (13, 4, 3),   # debris, albedo off
]


def test_round3_geometry_overflows_budget_at_s17():
    """The exact configuration that crashed BENCH_r03 (S=17 at the
    S=13-tuned 256x640 window) must be REJECTED by the budget model —
    if this starts passing, the model lost the failure it was
    calibrated on."""
    r3 = CohortGeometry(k=16, sx=256, sy=640, tile_y=512)
    assert cohort_vmem_bytes(17, 4, 7, r3) > VMEM_BUDGET_BYTES


@pytest.mark.parametrize("S,A,C", MODEL_CHANNEL_COUNTS)
def test_auto_geometry_fits_budget(S, A, C):
    """Every shipped channel count must auto-choose a valid geometry
    whose modeled footprint is under the budget."""
    g = choose_geometry(S, A, C).validate()
    assert cohort_vmem_bytes(S, A, C, g) <= VMEM_BUDGET_BYTES
    # Alignment invariants Mosaic hard-requires (opaque failure if not):
    assert g.sx % 8 == 0 and g.sy % 128 == 0
    assert g.tile_x % 8 == 0 and g.tile_y % 128 == 0
    assert g.tile_y + 2 * g.k <= g.sy
    # Efficiency floor: the kernel is VPU-issue-bound, so the wasted
    # halo-ring fraction is wasted wall-clock. Guard against the chooser
    # silently degrading to a tiny window.
    assert g.tile_x * g.tile_y / (g.sx * g.sy) >= 0.5


def test_geometry_budget_monotone_in_state():
    """More state channels must never be granted a LARGER window."""
    g17 = choose_geometry(17, 4, 7)
    g13 = choose_geometry(13, 4, 7)
    assert cohort_vmem_bytes(17, 4, 7, g17) <= VMEM_BUDGET_BYTES
    assert g17.sx * g17.sy <= g13.sx * g13.sy


def test_choose_geometry_raises_when_nothing_fits():
    with pytest.raises(ValueError):
        choose_geometry(17, 4, 7, budget=1 * 1024 * 1024)


def test_legacy_closure_models_smaller_body():
    """The dispersion-split closure holds fewer live temporaries; the
    model must reflect that (it routes smaller windows to offsets)."""
    g = CohortGeometry(k=16, sx=256, sy=640, tile_y=512)
    on = cohort_vmem_bytes(17, 4, 7, g, CohortClosure(offsets=True))
    off = cohort_vmem_bytes(17, 4, 7, g, CohortClosure(offsets=False))
    assert off < on


def test_cohort_advance_uses_auto_geometry(monkeypatch):
    """cohort_advance with geometry=None must consult the chooser (the
    auto-shrink path), mirroring ops/sweep.py's MAX_SWEEP_CHANNELS."""
    import jax.numpy as jnp

    calls = []
    real = cohort.choose_geometry

    def spy(S, A, C, closure=None, budget=VMEM_BUDGET_BYTES, grid=None):
        g = real(S, A, C, closure, budget, grid)
        calls.append((S, A, C, g))
        return g

    monkeypatch.setattr(cohort, "choose_geometry", spy)

    def rules(dL, inv, w, carried, u2, aux):
        return 1.0 / (1.0 + dL), (jnp.exp(-dL * jnp.ones_like(w)),)

    rules.classes = (0,)
    W = H = 16
    z = jnp.zeros((W, H))
    o = jnp.ones((W, H))
    st = [o, 0.1 * o, z, 0.01 * o, z, z, 0.5 * o, 0.5 * o,
          o / 3.0, o / 3.0, o]
    aux = [0.1 * o, z, o]
    cohort.cohort_advance(st, aux, rules, 2, 1.0, interpret=True)
    assert calls and calls[0][:3] == (11, 3, 1)


def test_sweep_channel_cap_routes_to_reference():
    """The linear sweep's arbitrary-C guard (MAX_SWEEP_CHANNELS) still
    routes oversized channel counts to the jnp fixed point."""
    import jax.numpy as jnp

    from soillib_tpu.ops import sweep

    C = sweep.MAX_SWEEP_CHANNELS + 1
    E = jnp.ones((C, 8, 8))
    att = jnp.full((C, 8, 8), 0.5)
    vx = jnp.ones((8, 8))
    vy = jnp.zeros((8, 8))
    out = sweep.transport_advance(jnp.zeros_like(E), E, att, vx, vy, 3)
    ref = sweep.transport_advance_reference(
        jnp.zeros_like(E), E, att, vx, vy, 3
    )
    assert jnp.allclose(out, ref)
