"""DEM conditioning (Planchon–Darboux depression filling)."""

import jax.numpy as jnp
import numpy as np

import soillib_tpu as soil


def _bowl(W=24, H=24, depth=2.0):
    """Raised rim with a closed interior depression."""
    x = np.arange(W)[:, None]
    y = np.arange(H)[None, :]
    r = np.sqrt((x - W / 2) ** 2 + (y - H / 2) ** 2)
    h = 5.0 - 0.1 * r            # cone sloping outward (rim lower)
    h[r < 5] -= depth            # carve a pit in the middle
    return np.asarray(h, np.float32)


def test_fill_raises_only_depressions():
    h = _bowl()
    out = np.asarray(soil.fill_depressions(h))
    assert (out >= h - 1e-6).all()
    # the pit floor was raised
    assert out[12, 12] > h[12, 12] + 1.0
    # boundary untouched
    np.testing.assert_allclose(out[0, :], h[0, :])
    np.testing.assert_allclose(out[:, -1], h[:, -1])


def test_conditioned_dem_has_no_interior_pits():
    h = _bowl()
    out = soil.fill_depressions(h)
    flow = np.asarray(soil.steepest(out, soil.d8))
    W, H = h.shape
    interior = np.zeros((W, H), bool)
    interior[1:-1, 1:-1] = True
    # every interior cell drains somewhere after conditioning
    assert (flow[interior] >= 0).all()


def test_flat_resolution_epsilon_gradient():
    h = np.zeros((16, 16), np.float32)   # perfectly flat
    out = soil.fill_depressions(h, eps=1e-3)
    flow = np.asarray(soil.steepest(out, soil.d8))
    interior = np.zeros_like(h, bool)
    interior[1:-1, 1:-1] = True
    assert (flow[interior] >= 0).all()   # flats now drain outward


def test_nan_holes_act_as_boundaries():
    h = _bowl()
    h[12, 12] = np.nan  # hole at the pit bottom: depression drains into it
    out = np.asarray(soil.fill_depressions(h))
    assert np.isnan(out[12, 12])
    # neighbors of the hole need not be filled to the spill level anymore
    assert out[12, 13] < 5.0 - 0.1 * 1 + 0.5


def test_no_change_on_already_conditioned():
    W = H = 16
    x = np.arange(W)[:, None].astype(np.float32)
    h = np.broadcast_to(0.1 * x, (W, H)).copy()  # monotone ramp
    out = np.asarray(soil.fill_depressions(h))
    np.testing.assert_allclose(out, h, atol=1e-6)


def test_fill_preserves_dtype():
    """float64 input stays float64 (the reference's dem_condition.py:45-49
    notes f64 is needed to reproduce external flow-direction state)."""
    import jax

    h = _bowl().astype(np.float64)
    out = soil.fill_depressions(jnp.asarray(h))
    expected = np.float64 if jax.config.jax_enable_x64 else np.float32
    # without x64, jax silently downcasts on asarray — either way the op
    # itself must not force a cast below the input precision
    assert np.asarray(out).dtype == expected
    h32 = _bowl()
    assert np.asarray(soil.fill_depressions(h32)).dtype == np.float32
