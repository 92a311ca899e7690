"""Golden-trajectory regression net (SURVEY.md §4 item 2).

Field statistics after 10 coupled steps on a fixed config, recorded from
the framework itself (the reference publishes no numbers to pin against —
BASELINE.md). Any numerical change to the model shows up here; intended
drift must update the goldens deliberately.
"""

import jax
import numpy as np

import soillib_tpu as soil

# (mean, std, absmax) after 10 steps @64², transportIterations=16, key=3.
# Re-pinned 2026-08-17 after the round-2 transport parity program (age-
# structured debris cohort sweep + birth-density quirk + expected-step
# attenuation) — benchmarks/parity.py documents the model change.
GOLDEN = {
    "height": (1.960278e+00, 1.005997e-01, 2.252767e+00),
    "discharge": (1.616299e+00, 1.965197e+00, 1.743848e+01),
    "mass": (6.182768e-12, 3.032480e-11, 5.206094e-10),
    "sediment": (1.717216e-03, 2.232659e-03, 1.344377e-02),
}


def test_erosion_trajectory_matches_golden():
    param = soil.ErosionParams()
    param.transportIterations = 16
    scale = (0.1, 0.1, 4.0)
    h = soil.noise((64, 64), soil.noise_t(seed=5.0, ext=(64.0, 64.0))) * 0.5 + 2.0
    state = soil.ErosionState.zeros((64, 64), height=h)
    state = soil.erode(state, scale, param, steps=10,
                       key=jax.random.PRNGKey(3))
    for name, (mean, std, absmax) in GOLDEN.items():
        arr = np.asarray(getattr(state, name))
        np.testing.assert_allclose(arr.mean(), mean, rtol=1e-3, err_msg=name)
        np.testing.assert_allclose(arr.std(), std, rtol=1e-3, err_msg=name)
        np.testing.assert_allclose(np.abs(arr).max(), absmax, rtol=1e-3,
                                   err_msg=name)


def test_trajectory_is_deterministic():
    """Same key -> bitwise identical trajectory (threefry determinism)."""
    param = soil.ErosionParams()
    param.transportIterations = 8
    scale = (0.1, 0.1, 4.0)
    h = soil.noise((32, 32), soil.noise_t(seed=1.0))
    state = soil.ErosionState.zeros((32, 32), height=h)
    a = soil.erode(state, scale, param, steps=3, key=jax.random.PRNGKey(7))
    b = soil.erode(state, scale, param, steps=3, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.layers), np.asarray(b.layers))
    np.testing.assert_array_equal(np.asarray(a.discharge),
                                  np.asarray(b.discharge))
