"""Stencil / filter op tests vs numpy oracles."""

import numpy as np
import pytest

import soillib_tpu as soil
from tests import oracles


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(3)
    return rng.random((20, 15), dtype=np.float32)


def test_gradient_interior(field):
    g = np.asarray(soil.gradient(field, (2.0, 0.5)))
    gx = (field[2:, 1:-1] - field[:-2, 1:-1]) * 0.5 / 2.0
    gy = (field[1:-1, 2:] - field[1:-1, :-2]) * 0.5 / 0.5
    np.testing.assert_allclose(g[1:-1, 1:-1, 0], gx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g[1:-1, 1:-1, 1], gy, rtol=1e-5, atol=1e-6)


def test_gradient_boundary_one_sided(field):
    g = np.asarray(soil.gradient(field, (1.0, 1.0)))
    # x = 0: no backward neighbor -> central NaN -> gxn NaN -> gxp
    np.testing.assert_allclose(
        g[0, 1:-1, 0], field[1, 1:-1] - field[0, 1:-1], rtol=1e-5
    )
    np.testing.assert_allclose(
        g[-1, 1:-1, 0], field[-1, 1:-1] - field[-2, 1:-1], rtol=1e-5
    )


def test_negslope_zero_in_pits():
    h = np.ones((5, 5), np.float32)
    h[2, 2] = 0.0  # pit
    ns = np.asarray(soil.negslope(h, (1.0, 1.0)))
    assert ns[2, 2] == 0.0
    assert ns[1, 2] > 0.0


def test_laplacian_of_linear_field_is_zero():
    x = np.arange(16, dtype=np.float32)[:, None]
    y = np.arange(12, dtype=np.float32)[None, :]
    h = (3.0 * x + 2.0 * y).astype(np.float32)
    lap = np.asarray(soil.laplacian(h, (1.0, 1.0)))
    # interior exactly zero; boundary-continuation makes edges nonzero
    np.testing.assert_allclose(lap[1:-1, 1:-1], 0.0, atol=1e-4)


def test_laplacian_quadratic():
    x = np.arange(16, dtype=np.float32)[:, None]
    h = np.broadcast_to(x * x, (16, 12)).astype(np.float32)
    lap = np.asarray(soil.laplacian(h, (1.0, 1.0)))
    # d2/dx2 = 2 ; 9-point blend still gives 2 for pure-x quadratic
    np.testing.assert_allclose(lap[2:-2, 2:-2], 2.0, rtol=1e-4)


def test_laplacian_channels(field):
    v2 = np.stack([field, 2 * field], axis=-1)
    lap = np.asarray(soil.laplacian(v2, (1.0, 1.0)))
    lap1 = np.asarray(soil.laplacian(field, (1.0, 1.0)))
    np.testing.assert_allclose(lap[..., 0], lap1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(lap[..., 1], 2 * lap1, rtol=1e-5, atol=1e-5)


def test_gaussian_blur_matches_oracle(field):
    got = np.asarray(soil.gaussian_blur(field, 2.5))
    want = oracles.gaussian_blur_oracle(field, 2.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gaussian_blur_channels(field):
    v2 = np.stack([field, field], axis=-1)
    got = np.asarray(soil.gaussian_blur(v2, 1.5))
    want = np.asarray(soil.gaussian_blur(field, 1.5))
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-5)
    np.testing.assert_allclose(got[..., 1], want, rtol=1e-5)


def test_normal_unit_length_and_orientation():
    x = np.arange(16, dtype=np.float32)[:, None]
    h = np.broadcast_to(0.5 * x, (16, 12)).astype(np.float32)
    n = np.asarray(soil.normal(h, (1.0, 1.0, 1.0)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    assert (n[2:-2, :, 0] < 0).all()  # slope rises in +x -> normal tips -x
    assert (n[..., 2] > 0).all()


def test_noise_shape_range_determinism():
    p = soil.noise_t()
    p.seed = 3.0
    a = np.asarray(soil.noise((64, 48), p))
    b = np.asarray(soil.noise((64, 48), p))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 48)
    assert np.abs(a).max() <= 1.5
    # non-degenerate; default ext=512 means a 64-wide grid spans only
    # 1/8 of one noise feature, so variance is modest
    assert a.std() > 0.02
    # full-extent sampling has healthy variance
    p_full = soil.noise_t()
    p_full.ext = (64.0, 48.0)
    full = np.asarray(soil.noise((64, 48), p_full))
    assert full.std() > 0.1
    p2 = soil.noise_t()
    p2.seed = 4.0
    c = np.asarray(soil.noise((64, 48), p2))
    assert (a != c).any()


def test_resize_bilinear_constant():
    src = np.full((16, 16), 3.5, np.float32)
    dst = np.asarray(soil.resize(src, (37, 11)))
    assert dst.shape == (37, 11)
    np.testing.assert_allclose(dst, 3.5, rtol=1e-6)


def test_resize_linear_ramp():
    x = np.linspace(0, 1, 32, dtype=np.float32)[:, None]
    src = np.broadcast_to(x, (32, 8)).astype(np.float32)
    dst = np.asarray(soil.resize(src, (64, 8)))
    # interior of an upscaled linear ramp stays linear
    d = np.diff(dst[4:-4, 0])
    np.testing.assert_allclose(d, d.mean(), atol=1e-3)
