"""sample_t parity: 1-D and value+gradient interpolation variants
(ref: model/path/sample.hpp:25-186)."""

import jax
import jax.numpy as jnp
import numpy as np

from soillib_tpu.ops.transport import (
    bilinear_gather,
    bilinear_gather_grad,
    linear_gather,
)


def _field(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_bilinear_grad_value_matches_plain_gather():
    f = _field(jax.random.PRNGKey(0), 12, 9)
    pos = jnp.array([[3.25, 4.5], [0.0, 0.0], [10.99, 7.99], [11.0, 8.0]])
    v0 = bilinear_gather(f, pos)
    v1, _ = bilinear_gather_grad(f, pos)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


def test_bilinear_grad_matches_autodiff():
    """The analytic sample.hpp gradient == d(val)/d(pos) inside a cell
    (bilinear is smooth there)."""
    f = _field(jax.random.PRNGKey(1), 8, 8)
    p = jnp.array([3.3, 2.7])
    _, g = bilinear_gather_grad(f, p[None])
    ad = jax.jacfwd(lambda q: bilinear_gather(f, q[None])[0])(p)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(ad),
                               rtol=1e-5, atol=1e-6)


def test_bilinear_grad_oob_nan_and_far_edge():
    f = _field(jax.random.PRNGKey(2), 6, 6)
    v, g = bilinear_gather_grad(f, jnp.array([[-0.5, 2.0], [2.0, 9.0]]))
    assert np.isnan(np.asarray(v)).all()
    assert np.isnan(np.asarray(g)).all()
    # Far edge: pos.x in (W-2, W-1] drops the +1 sample (weight 0) —
    # value equals the edge row's y-lerp, x-gradient collapses to 0.
    v, g = bilinear_gather_grad(f, jnp.array([[5.0, 2.5]]))
    want = f[5, 2] + 0.5 * (f[5, 3] - f[5, 2])
    np.testing.assert_allclose(float(v[0]), float(want), rtol=1e-6)
    assert float(g[0, 0]) == 0.0


def test_linear_gather_val_grad():
    f = jnp.array([1.0, 3.0, 2.0, 5.0])
    # Reference far-edge quirk (sample.hpp:173-174 applied 1-D): the
    # whole last CELL [N-2, N-1] drops the +1 weight, so pos 2.25
    # freezes to f[2] (the 2-D gather does the same per axis).
    v, g = linear_gather(f, jnp.array([0.5, 2.25]))
    np.testing.assert_allclose(np.asarray(v), [2.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), [2.0, 3.0], rtol=1e-6)
    # OOB -> NaN; far edge drops the +1 sample.
    v, g = linear_gather(f, jnp.array([-0.1, 4.0]))
    assert np.isnan(np.asarray(v)).all()
    v, g = linear_gather(f, jnp.array([3.0]))
    np.testing.assert_allclose(float(v[0]), 5.0)
    assert float(g[0]) == 0.0


def test_linear_gather_multichannel():
    f = _field(jax.random.PRNGKey(3), 7, 3)
    v, g = linear_gather(f, jnp.array([1.5]))
    np.testing.assert_allclose(
        np.asarray(v[0]), np.asarray(0.5 * (f[1] + f[2])), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g[0]), np.asarray(f[2] - f[1]), rtol=1e-6
    )
