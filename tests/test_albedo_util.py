"""Albedo generators (in-sim visualization, erosion.cu:759-919) and the
plotting/util surface (headless)."""

import os

import jax.numpy as jnp
import numpy as np

import soillib_tpu as soil
from soillib_tpu.models.erosion import (
    albedo_discharge,
    albedo_layer,
    albedo_stratum,
)


def _layers(W=16, H=12, sed=0.0):
    bed = jnp.broadcast_to(jnp.linspace(0, 1, W)[:, None], (W, H))
    return jnp.stack([bed, jnp.full((W, H), sed)], axis=0)


def test_albedo_stratum_stripes():
    """Stripe color alternates with depth bands of width `freq`."""
    layers = _layers()
    uplift = jnp.ones((16, 12))
    cA, cB = (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)
    out = np.asarray(
        albedo_stratum(uplift, layers, (1, 1, 1.0), soil.ErosionParams(),
                       cA, cB, age=1000.0, freq=0.1)
    )
    assert out.shape == (3, 16, 12)
    # only the two stripe colors appear
    cols = {tuple(c) for c in out.reshape(3, -1).T.tolist()}
    assert cols <= {cA, cB}
    assert len(cols) == 2  # both bands present on a sloped bed


def test_albedo_layer_blend_limits():
    """No sediment -> pure bedrock color; deep sediment -> sediment color."""
    white = jnp.ones((3, 16, 12))
    red = jnp.zeros((3, 16, 12)).at[0].set(1.0)
    bare = albedo_layer(red, white, _layers(sed=0.0), 5.0, 0.0)
    np.testing.assert_allclose(np.asarray(bare), np.asarray(red), atol=1e-6)
    deep = albedo_layer(red, white, _layers(sed=1e6), 5.0, 0.0)
    np.testing.assert_allclose(np.asarray(deep), np.asarray(white), atol=1e-4)


def test_albedo_discharge_extinction():
    """Zero discharge keeps the base color; huge discharge saturates to the
    water color."""
    base = jnp.ones((3, 8, 8))
    blue = (0.1, 0.2, 0.9)
    dry = albedo_discharge(base, jnp.zeros((8, 8)), blue, 10.0, 1.0)
    np.testing.assert_allclose(np.asarray(dry), np.asarray(base), atol=1e-6)
    wet = albedo_discharge(base, jnp.full((8, 8), 1e6), blue, 10.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(wet), np.broadcast_to(np.array(blue)[:, None, None],
                                         (3, 8, 8)), atol=1e-4)


def test_plot_surface_headless(tmp_path):
    h = np.asarray(soil.noise((24, 24), soil.noise_t()))
    calls = [
        lambda p: soil.util.plot_area(np.abs(h) * 100 + 1, show=False, save=p),
        lambda p: soil.util.plot_dem(h, show=False, save=p),
        lambda p: soil.util.plot_flow(
            np.asarray(soil.direction(h, soil.d8)), show=False, save=p),
        lambda p: soil.util.show_height(h, show=False, save=p),
        lambda p: soil.util.show_normal(h, (1, 1, 1), show=False, save=p),
        lambda p: soil.util.show_relief(h, (1, 1, 1), show=False, save=p),
        lambda p: soil.util.show_discharge(np.abs(h), show=False, save=p),
        lambda p: soil.util.show_mass(np.abs(h), show=False, save=p),
        lambda p: soil.util.show_layers(
            np.stack([h, np.abs(h)], axis=0), show=False, save=p),
        lambda p: soil.util.plot_images([h, h], show=False, save=p),
    ]
    for i, fn in enumerate(calls):
        p = str(tmp_path / f"p{i}.png")
        fn(p)
        assert os.path.getsize(p) > 500, f"plot {i} empty"


def test_relief_shade_range():
    h = np.asarray(soil.noise((16, 16), soil.noise_t()))
    n = np.asarray(soil.normal(h, (1, 1, 1)))  # stencil ops stay (W, H, 3)
    r = soil.util.relief_shade(h, n)
    assert r.shape == (16, 16)
    assert np.isfinite(r).all()
