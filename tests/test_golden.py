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
# Re-pinned 2026-08-17 after switching the default noise to the
# FastNoiseLite-compat OpenSimplex2 pipeline (the initial terrain changed;
# the model itself did not — tests/test_noise.py pins the terrain against
# goldens dumped from the vendored library).
GOLDEN = {
    "height": (1.941293e+00, 8.773226e-02, 2.151546e+00),
    "discharge": (1.571187e+00, 1.489534e+00, 1.077810e+01),
    "mass": (2.166029e-12, 7.342983e-12, 1.347082e-10),
    "sediment": (1.911237e-03, 2.303055e-03, 1.441507e-02),
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
