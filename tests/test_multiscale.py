"""Multiscale cascade driver (reference: erosion_gpu_multiscale.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import soillib_tpu as soil
from soillib_tpu import parallel as par


def _init_state(res):
    h = soil.noise(res, soil.noise_t(ext=(64.0, 64.0))) * 0.5 + 2.0
    return soil.ErosionState.zeros(res, height=h)


def test_resize_state_resamples_all_fields():
    st = _init_state((32, 32))
    st2 = soil.resize_state(st, (64, 48))
    assert st2.layers.shape == (2, 64, 48)
    assert st2.momentum.shape == (2, 64, 48)
    assert st2.albedo_surface.shape == (3, 64, 48)
    # Bilinear upsample preserves the mean height closely.
    np.testing.assert_allclose(
        float(st2.height.mean()), float(st.height.mean()), rtol=1e-2
    )


def test_level_scale_matches_reference_formula():
    # pscale = wscale / res (erosion_gpu_multiscale.py:107-109)
    assert soil.level_scale((80.0, 40.0), 4.0, (128, 64)) == (
        80.0 / 128, 40.0 / 64, 4.0)


def test_cascade_runs_coarse_to_fine():
    param = soil.ErosionParams()
    param.transportIterations = 4
    st = _init_state((16, 16))
    seen = []
    out = soil.run_cascade(
        st,
        levels=[((16, 16), 2), ((32, 32), 1)],
        world_extent=(20.0, 20.0),
        zscale=4.0,
        param=param,
        on_level=lambda i, res, s: seen.append((i, res)),
    )
    assert seen == [(0, (16, 16)), (1, (32, 32))]
    assert out.rainfall.shape == (32, 32)
    assert np.isfinite(np.asarray(out.height)).all()


def test_cascade_sharded_level_matches_single_device():
    mesh = par.make_mesh()
    param = soil.ErosionParams()
    param.transportIterations = 4
    st = _init_state((16, 24))
    kw = dict(
        levels=[((16, 24), 1), ((32, 48), 1)],
        world_extent=(20.0, 20.0),
        zscale=4.0,
        param=param,
        key=jax.random.PRNGKey(5),
    )
    want = soil.run_cascade(st, **kw)
    got = soil.run_cascade(st, mesh=mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(got.height), np.asarray(want.height), rtol=1e-4, atol=1e-5
    )
