"""Erosion model kernel tests (oracles + invariants from SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import soillib_tpu as soil
from soillib_tpu.models.erosion import godunov_gradient, mass_creep, mass_transfer
from tests import oracles

SCALE = (0.078, 0.078, 4.0)


@pytest.fixture(scope="module")
def layers():
    rng = np.random.default_rng(7)
    bed = (0.3 * rng.random((16, 13)) + np.linspace(0, 1, 16)[:, None]).astype(
        np.float32
    )
    sed = (0.05 * rng.random((16, 13))).astype(np.float32)
    return np.stack([bed, sed], axis=0)


def test_godunov_gradient_matches_oracle(layers):
    h = layers[0] + layers[1]
    got = np.moveaxis(np.asarray(godunov_gradient(h, SCALE, 0.02)), 0, -1)
    want = oracles.glocal_oracle(h, SCALE, 0.02)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_creep_matches_oracle(layers):
    p = soil.param_t()
    delta = np.zeros_like(layers)
    got = np.asarray(mass_creep(delta, layers, SCALE, p))
    want = oracles.creep_oracle(np.moveaxis(layers, 0, -1), SCALE,
                                p.critSlopeSediment)
    np.testing.assert_allclose(got[1], want, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got[0], 0.0)


def test_creep_mass_conservation(layers):
    """Creep must be exactly mass-conservative (symmetric transfer)."""
    p = soil.param_t()
    delta = np.zeros_like(layers)
    got = np.asarray(mass_creep(delta, layers, SCALE, p))
    np.testing.assert_allclose(got[1].sum(), 0.0, atol=1e-5)


def test_creep_flattens_steep_sediment():
    """A sediment spike above critical slope must spread, conserving mass."""
    p = soil.param_t()
    bed = np.zeros((9, 9), np.float32)
    sed = np.zeros((9, 9), np.float32)
    sed[4, 4] = 1.0
    layers = np.stack([bed, sed], axis=0)
    delta = np.asarray(mass_creep(np.zeros_like(layers), layers, SCALE, p))
    assert delta[1, 4, 4] < 0.0
    assert delta[1, 3, 4] > 0.0 and delta[1, 5, 4] > 0.0
    np.testing.assert_allclose(delta[1].sum(), 0.0, atol=1e-6)


def test_mass_transfer_uplift_only():
    """On flat terrain with zero transported fields, the only height change
    is uplift: delta = dt*ku*uplift/sz on the bedrock layer (no slope => no
    fluvial or debris erosion, erosion.cu:496-514)."""
    p = soil.param_t()
    W, H = 16, 13
    layers = np.zeros((2, W, H), np.float32)
    z = np.zeros((W, H), np.float32)
    z2 = np.zeros((2, W, H), np.float32)
    white = np.ones((3, W, H), np.float32)
    uplift = np.random.default_rng(0).random((W, H)).astype(np.float32)
    delta, alb = mass_transfer(
        z2, layers, uplift, z, z, z2, z, z2, white, white, white, white, SCALE, p
    )
    delta = np.asarray(delta)
    want = p.timeStep * p.uplift * uplift / SCALE[2]
    np.testing.assert_allclose(delta[0], want, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(delta[1], 0.0, atol=1e-7)


def test_mass_transfer_deposit_clamp(layers):
    """Deposition is clamped to +0.25 * L * 0.3 (erosion.cu:528)."""
    p = soil.param_t()
    p.uplift = 0.0
    W, H = layers.shape[1:]
    z = np.zeros((W, H), np.float32)
    z2 = np.zeros((2, W, H), np.float32)
    white = np.ones((3, W, H), np.float32)
    big_mass = np.full((W, H), 1e9, np.float32)  # force huge deposition
    delta, _ = mass_transfer(
        z2, layers, z, z, big_mass, z2, z, z2, white, white, white, white, SCALE, p
    )
    L = np.hypot(SCALE[0], SCALE[1])
    np.testing.assert_allclose(
        np.asarray(delta)[1], 0.25 * L * 0.3 / SCALE[2], rtol=1e-5
    )


def test_mass_transfer_erosion_eats_sediment_first():
    """Erosion must deplete the sediment layer before bedrock."""
    p = soil.param_t()
    p.uplift = 0.0
    p.suspensionRateDebris = 0.0
    p.depositionRateDebris = 0.0
    p.landslideRateDebris = 1.0  # strong debris landslide erosion
    p.critSlopeBedrock = 0.0
    W, H = 8, 8
    bed = np.linspace(1, 0, W, dtype=np.float32)[:, None] * np.ones((1, H), np.float32)
    thin = 1e-5
    sed = np.full((W, H), thin, np.float32)
    layers = np.stack([bed, sed], axis=0)
    z = np.zeros((W, H), np.float32)
    z2 = np.zeros((2, W, H), np.float32)
    white = np.ones((3, W, H), np.float32)
    delta, _ = mass_transfer(
        z2, layers, z, z, z, z2, z, z2, white, white, white, white, SCALE, p
    )
    delta = np.asarray(delta)
    inner = delta[:, 1:-1, 1:-1]
    # sediment loss never exceeds the available sediment
    assert (inner[1] >= -thin - 1e-7).all()
    # and the remaining erosion goes to bedrock
    assert (inner[0] < 0.0).any()


def test_stepsize_var_matches_monte_carlo():
    """Closed-form Var[step] (the cohort's per-transit velocity-variance
    injection, ops/transport.py stepsize_var) vs direct MC of
    T = min(U/a, sqrt2) per axis, step = (Tx+Ty)/2."""
    from soillib_tpu.ops.transport import stepsize_var

    rng = np.random.default_rng(0)
    U1, U2 = rng.random(400000), rng.random(400000)
    for vx, vy in [(1.0, 0.0), (0.7071, 0.7071), (0.3, 0.954),
                   (0.05, 0.999), (0.9, 0.1)]:
        ax_, ay_ = abs(vx), abs(vy)
        Tx = np.minimum(U1 / max(ax_, 1e-20), np.sqrt(2))
        Ty = np.minimum(U2 / max(ay_, 1e-20), np.sqrt(2))
        want = (0.5 * (Tx + Ty)).var()
        got = float(stepsize_var(jnp.float32(vx), jnp.float32(vy)))
        np.testing.assert_allclose(got, want, rtol=0.02,
                                   err_msg=str((vx, vy)))


def test_stepsize_var_degenerate_directions_finite():
    """The subnormal-direction regime (|u| ~ 1e-19) once produced 0/0 =
    NaN under flush-to-zero arithmetic (collapsed debris cohorts hit it
    in coupled runs); the small-a branch must return the finite linear
    limit (2*sqrt(2)/3) * a."""
    from soillib_tpu.ops.transport import stepsize_var

    a = jnp.float32(1e-19)
    v = np.asarray(stepsize_var(a, jnp.float32(0.0)))
    assert np.isfinite(v)
    np.testing.assert_allclose(v, 0.25 * 0.9428090415820634 * 1e-19,
                               rtol=1e-4)
    assert np.isfinite(np.asarray(stepsize_var(jnp.zeros((4, 4)),
                                               jnp.zeros((4, 4))))).all()
    # reverse mode at the branch point stays finite (double-where)
    g = jax.grad(lambda x: jnp.sum(stepsize_var(x, x)))(
        jnp.full((3,), 1e-19, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_transport_fluvial_shapes_and_rain(layers):
    """Field transport: rain-only run yields positive discharge that grows
    downstream (accumulation along the flow)."""
    p = soil.param_t()
    p.maxage = 64
    W, H = layers.shape[1:]
    rain = np.ones((W, H), np.float32)
    z = np.zeros((W, H), np.float32)
    z2 = np.zeros((2, W, H), np.float32)
    white = np.ones((3, W, H), np.float32)
    dis, mas, mom, alb = soil.transport_fluvial(
        layers, rain, z, z, z2, white, SCALE, p
    )
    dis = np.asarray(dis)
    assert dis.shape == (W, H)
    assert np.asarray(mom).shape == (2, W, H)
    assert (dis > 0.0).all()
    # terrain slopes down in -x? bed has +x ramp -> flow toward -x;
    # downstream (small x) cells should accumulate more water on average.
    assert dis[1:4].mean() > dis[-4:-1].mean()


def test_erode_step_runs_and_conserves_sanity(layers):
    p = soil.param_t()
    p.maxage = 32
    p.timeStep = 100.0
    state = soil.ErosionState.zeros(
        layers.shape[1:], height=layers[0], sediment=layers[1]
    )
    out = soil.erode(state, SCALE, p, steps=2)
    h = np.asarray(out.height)
    assert np.isfinite(h).all()
    assert np.isfinite(np.asarray(out.discharge)).all()
    assert np.isfinite(np.asarray(out.momentum)).all()
    # terrain actually changed
    assert (np.abs(h - (layers[0] + layers[1])) > 0).any()


# ---------------------------------------------------------------------------
# Transport parity net: the field solvers vs the converged particle MC
# oracle (the in-repo faithful port of erosion.cu:29-141 / 245-351).
# Full study + methodology: benchmarks/parity.py and RESULTS.md; the
# thresholds here sit just below the measured levels so regressions of
# the cohort closure trip immediately.
# ---------------------------------------------------------------------------


def _parity_setup(terrain_name, warm):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import parity

    p = soil.param_t()
    p.nSamples = 32 * 32 * 24
    p.maxage = 64
    p.transportIterations = 62  # == MC deposit opportunities (maxage - 2)
    scale = (0.078, 0.078, 4.0)
    terr = parity.make_terrains(32, (terrain_name,))[terrain_name]
    state = parity.make_state(terr, warm, scale, p)
    return parity, state, scale, p


def _check(rep, field, rel_max, corr_min):
    m = rep[field]
    assert m["rel_mean"] <= rel_max, (field, m)
    # When the MC oracle itself has no spatial signal (split-half self-
    # correlation ~ 0, e.g. a constant field), correlation is noise —
    # require tracking the noise floor instead.
    target = min(corr_min, m["mc_selfcorr"] - 0.1)
    assert m["corr"] >= target, (field, m)


def test_parity_fluvial_smooth():
    """Converged MC vs field solve, smooth ramp, warm state: all output
    fields within 3% mean / 0.97 correlation (measured ~0.5% / 0.997)."""
    parity, st, scale, p = _parity_setup("ramp", warm=6)
    rep = parity.compare_fluvial(st, scale, p, 8)
    for f in ("discharge", "mass", "momentum", "albedo"):
        _check(rep, f, rel_max=0.03, corr_min=0.97)


def test_parity_fluvial_structured():
    """Steep structured terrain: discharge/mass/momentum within 5% mean,
    0.90 correlation (measured ~1% / 0.95-0.99)."""
    parity, st, scale, p = _parity_setup("steep", warm=6)
    rep = parity.compare_fluvial(st, scale, p, 8)
    for f in ("discharge", "mass", "momentum"):
        _check(rep, f, rel_max=0.05, corr_min=0.90)


def test_parity_fluvial_conditioned_documented_bias():
    """Conditioned DEM: the moment closure leaves a documented residual
    (non-Gaussian velocity mixtures at confluences, RESULTS.md).  The
    offset-routed closure trades a little mean bias for pattern fidelity
    vs round 2 (rel 0.05->0.06, corr 0.78->0.84): discharge ≤8% mean /
    ≥0.82 corr, momentum ≥0.45."""
    parity, st, scale, p = _parity_setup("conditioned", warm=6)
    rep = parity.compare_fluvial(st, scale, p, 8)
    _check(rep, "discharge", rel_max=0.08, corr_min=0.82)
    _check(rep, "momentum", rel_max=0.05, corr_min=0.45)
    # Suspended-mass guard at the measured round-3 level (rel 0.72 /
    # corr 0.54 at this config): the offset-routing closure's accepted
    # conditioned-mass cost is PINNED here so further drift fails CI
    # rather than passing silently (the default-closure gap; the
    # quality-mode closures measure far lower — RESULTS.md).
    _check(rep, "mass", rel_max=0.80, corr_min=0.50)


def test_parity_fluvial_conditioned_quality_closure():
    """The quality-mode closure (face-routed nodes + colored births)
    must keep its measured parity GAIN over the default on the terrain
    the default is weakest on (measured at this config: discharge
    0.023/0.927, momentum 0.004/0.932 vs default 0.064/0.845 and
    0.036/0.836 — the round-4 mixture-representation fix, RESULTS.md
    quality-mode study)."""
    from soillib_tpu.ops.cohort import CohortClosure

    parity, st, scale, p = _parity_setup("conditioned", warm=6)
    pq = p.replace(closure=CohortClosure(nodes=4, colors=2,
                                         color_rule="hash"))
    rep = parity.compare_fluvial(st, scale, pq, 8)
    _check(rep, "discharge", rel_max=0.04, corr_min=0.90)
    _check(rep, "momentum", rel_max=0.01, corr_min=0.90)
    _check(rep, "mass", rel_max=0.70, corr_min=0.60)


def test_parity_debris():
    """Debris cohort rheology vs converged MC on ramp AND structured
    terrain — the round-1 gap (static field solve: rel 100%, corr 0)."""
    parity, st, scale, p = _parity_setup("steep", warm=6)
    rep = parity.compare_debris(st, scale, p, 8)
    for f in ("mass", "momentum", "albedo"):
        _check(rep, f, rel_max=0.03, corr_min=0.90)

    parity, st, scale, p = _parity_setup("ramp", warm=6)
    rep = parity.compare_debris(st, scale, p, 8)
    for f in ("mass", "momentum", "albedo"):
        _check(rep, f, rel_max=0.03, corr_min=0.90)


def test_parity_coupled_trajectory():
    """Multi-step coupled parity: 10 field-stepped vs particle-stepped
    steps on the ramp; the field trajectory must track the MC reference
    band on every prognostic field."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import parity

    p = soil.param_t()
    p.maxage = 64
    p.transportIterations = 62
    p.timeStep = 500.0
    p.nSamples = 32 * 32 * 48
    scale = (0.078, 0.078, 4.0)
    terr = parity.make_terrains(32, ("ramp",))["ramp"]
    rep = parity.compare_coupled(terr, scale, p, steps=10, n_rep=2)
    assert rep["height"]["field_vs_mc_corr"] >= 0.999, rep["height"]
    assert rep["height"]["field_vs_mc_relmean"] <= 0.005, rep["height"]
    assert rep["discharge"]["field_vs_mc_corr"] >= 0.93, rep["discharge"]
    assert rep["discharge"]["field_vs_mc_relmean"] <= 0.08, rep["discharge"]
    assert rep["mass"]["field_vs_mc_corr"] >= 0.90, rep["mass"]
    assert rep["debris"]["field_vs_mc_relmean"] <= 0.05, rep["debris"]


def test_parity_coupled_noise():
    """Coupled trajectory regression net on ROUGH (noise) terrain — the
    hardest parity regime (round-3 closure: offset-routed cohort with
    carried second moments).  Levels pin the measured r3 behavior with
    margin; the headline-config numbers live in benchmarks/parity_r3.json
    (mass rel 0.062 at the 48²/20-step config — below the 0.065 MC seed
    floor) and the gated slow test below.  Residual corr distance to the
    MC floor is the single-node mixture-representation limit, quantified
    by the split-ensemble study in RESULTS.md (corr -> 0.92 as co-located
    source populations separate)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import parity

    p = soil.param_t()
    p.maxage = 64
    p.transportIterations = 62
    p.timeStep = 500.0
    p.nSamples = 40 * 40 * 48
    scale = (0.078, 0.078, 4.0)
    terr = parity.make_terrains(40, ("noise",))["noise"]
    rep = parity.compare_coupled(terr, scale, p, steps=10, n_rep=2)
    # Measured r3: discharge 0.026/0.82, mass 0.42/0.52, momentum
    # 0.087/0.58, height exact.  (Suspended mass is numerically vestigial
    # at comparison time — total ~1e-11 of terrain scale — so its rel is
    # a dust ratio; see RESULTS.md.)
    assert rep["height"]["field_vs_mc_corr"] >= 0.9999, rep["height"]
    assert rep["discharge"]["field_vs_mc_relmean"] <= 0.06, rep["discharge"]
    assert rep["discharge"]["field_vs_mc_corr"] >= 0.77, rep["discharge"]
    assert rep["mass"]["field_vs_mc_relmean"] <= 0.55, rep["mass"]
    assert rep["mass"]["field_vs_mc_corr"] >= 0.45, rep["mass"]
    assert rep["momentum"]["field_vs_mc_relmean"] <= 0.13, rep["momentum"]
    assert rep["momentum"]["field_vs_mc_corr"] >= 0.50, rep["momentum"]


@pytest.mark.slow
def test_parity_coupled_noise_quality_8x():
    """The affordable quality point (round 5): colors=16 now costs ~6.7x
    a default step (debris keeps the single-ensemble closure; batched
    chunks), inside the <=8x budget, and lifts coupled noise parity
    well past the default closure.  Measured at this config: discharge
    0.899/1.7% (default 0.822), mass 0.673 (0.524), momentum 0.891
    (0.578); pinned with margin so regressions fail loudly.  The
    0.95/0.90 MC-floor march is representation-limited (colors saturate
    at the split-ensemble limit; sign/peak routing measured negative —
    RESULTS.md round-5 quality study)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import parity

    from soillib_tpu.ops.cohort import CohortClosure

    p = soil.param_t()
    p.maxage = 64
    p.transportIterations = 62
    p.timeStep = 500.0
    p.nSamples = 40 * 40 * 48
    p.closure = CohortClosure(colors=16, color_rule="hash")
    scale = (0.078, 0.078, 4.0)
    terr = parity.make_terrains(40, ("noise",))["noise"]
    rep = parity.compare_coupled(terr, scale, p, steps=10, n_rep=2)
    assert rep["discharge"]["field_vs_mc_corr"] >= 0.86, rep["discharge"]
    assert rep["discharge"]["field_vs_mc_relmean"] <= 0.04, rep["discharge"]
    assert rep["mass"]["field_vs_mc_corr"] >= 0.60, rep["mass"]
    assert rep["momentum"]["field_vs_mc_corr"] >= 0.85, rep["momentum"]
    assert rep["debris"]["field_vs_mc_corr"] >= 0.999, rep["debris"]


def test_parity_coupled_noise_headline():
    """Headline-config coupled noise parity (48², 20 steps, maxage 128) —
    the benchmarks/parity_r3.json numbers, re-asserted.  ~4 min; gated
    like the 256² golden."""
    import os

    if not os.environ.get("SOIL_SLOW_TESTS"):
        import pytest

        pytest.skip("set SOIL_SLOW_TESTS=1 to run (slow)")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import parity

    p = soil.param_t()
    p.maxage = 128
    p.timeStep = 500.0
    p.nSamples = 48 * 48 * 64
    scale = (0.078, 0.078, 4.0)
    terr = parity.make_terrains(48, ("noise",))["noise"]
    rep = parity.compare_coupled(terr, scale, p, steps=20, n_rep=3)
    assert rep["height"]["field_vs_mc_corr"] >= 0.9999, rep["height"]
    assert rep["discharge"]["field_vs_mc_relmean"] <= 0.12, rep["discharge"]
    assert rep["discharge"]["field_vs_mc_corr"] >= 0.74, rep["discharge"]
    assert rep["mass"]["field_vs_mc_relmean"] <= 0.12, rep["mass"]
    assert rep["mass"]["field_vs_mc_corr"] >= 0.40, rep["mass"]
    assert rep["momentum"]["field_vs_mc_corr"] >= 0.62, rep["momentum"]


def test_erosion_extreme_terrain_stays_finite():
    """Unphysically steep terrain (slopes ~100 m/m) drives the debris
    suspension into exponential runaway; carried totals must saturate at
    the f32-safe bound instead of reaching inf/NaN (the reference's own
    per-particle attenuation would overflow here, erosion.cu:344-346)."""
    import jax

    p = soil.param_t()
    p.transportIterations = 12
    W, H = 32, 32
    hgt = 2.0 + 0.5 * np.asarray(
        np.random.default_rng(0).normal(size=(W, H)), np.float32
    )
    state = soil.ErosionState.zeros((W, H), height=hgt)
    out = soil.erode(state, (0.08, 0.08, 4.0), p, steps=2,
                     key=jax.random.PRNGKey(1))
    for f in ("layers", "discharge", "mass", "momentum", "debris",
              "debris_momentum", "albedo_surface"):
        arr = np.asarray(getattr(out, f))
        assert np.isfinite(arr).all(), f


def test_compact_constant_fields_bitwise():
    """Broadcastable (1, 1) constant fields (ErosionState.zeros scalar
    rainfall/uplift/albedo_bedrock — the 8192² capacity configuration,
    bench.py) produce bitwise-identical trajectories to full-grid
    constants: the constants only ever enter elementwise arithmetic, so
    XLA broadcasting reproduces the same values and the saved ~2.5 GB of
    HBM at 8192² is free."""
    import jax

    W, H = 40, 40
    hgt = np.asarray(
        np.random.default_rng(3).random((W, H)), np.float32
    ) * 2.0
    p = soil.ErosionParams()
    p.transportIterations = 8
    full = soil.ErosionState.zeros((W, H), height=hgt)
    comp = soil.ErosionState.zeros((W, H), height=hgt, rainfall=1.0,
                                   uplift=0.0,
                                   albedo_bedrock=(1.0, 1.0, 1.0))
    assert comp.rainfall.shape == (1, 1)
    assert comp.uplift.shape == (1, 1)
    assert comp.albedo_bedrock.shape == (3, 1, 1)
    k = jax.random.PRNGKey(11)
    a = soil.erode(full, SCALE, p, steps=3, key=k)
    b = soil.erode(comp, SCALE, p, steps=3, key=k)
    for f in ("layers", "discharge", "mass", "momentum", "debris",
              "debris_momentum", "albedo_surface", "albedo_fluvial",
              "albedo_debris"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.array_equal(x, y), f


def test_track_albedo_off_prognostics_bitwise():
    """param.trackAlbedo = False (the 8192² capacity mode) drops only the
    albedo instrumentation: every prognostic field (height, water, mass,
    momentum, debris) matches the tracked run — albedo never feeds back
    into the dynamics — while all four albedo state fields stay
    broadcastable constants. Bitwise-identical on one device; under this
    suite's 8 virtual CPU devices the changed channel-stack shapes shift
    XLA's fusion/vectorization, leaving ulp-scale reassociation drift
    (measured maxabs ≤ 2e-5), hence the tight-but-nonzero tolerances."""
    import jax

    W, H = 40, 40
    hgt = np.asarray(
        np.random.default_rng(5).random((W, H)), np.float32
    ) * 2.0
    p_on = soil.ErosionParams()
    p_on.transportIterations = 8
    p_off = soil.ErosionParams()
    p_off.transportIterations = 8
    p_off.trackAlbedo = False
    k = jax.random.PRNGKey(4)
    full = soil.ErosionState.zeros((W, H), height=hgt)
    comp = soil.ErosionState.zeros((W, H), height=hgt, rainfall=1.0,
                                   uplift=0.0,
                                   albedo_bedrock=(1.0, 1.0, 1.0),
                                   albedo_surface=(1.0, 1.0, 1.0))
    a = soil.erode(full, SCALE, p_on, steps=3, key=k)
    b = soil.erode(comp, SCALE, p_off, steps=3, key=k)
    for f in ("layers", "discharge", "mass", "momentum", "debris",
              "debris_momentum"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=2e-4, err_msg=f)
    assert b.albedo_surface.shape == (3, 1, 1)
    assert b.albedo_fluvial.shape == (3, 1, 1)
    # tracked + compact albedo start: canonicalized to full, white ==
    # white, so trajectories still match the full-field tracked run
    c = soil.erode(comp, SCALE, p_on, steps=3, key=k)
    assert np.array_equal(np.asarray(a.albedo_surface),
                          np.asarray(c.albedo_surface))
    assert np.array_equal(np.asarray(a.layers), np.asarray(c.layers))
