"""FastNoiseLite-parity noise tests.

`tests/data/fastnoiselite_goldens.npz` holds grids sampled from the
reference's vendored FastNoiseLite (external/FastNoiseLite.h) through the
exact `soil::noise` entry path (op/noise.hpp:42-56: OpenSimplex2 +
FractalType_FBm, GetNoise(x/ext.x, y/ext.y, seed)) by a throwaway C++
dump tool. The compat noise path must match them to float32 roundoff —
this is what makes the reference example terrains (erosion_gpu.py seed-3
DEM, erosion_gpu_multiscale.py) reproducible field-for-field.
"""

import os

import numpy as np
import pytest

import soillib_tpu as soil

_GOLDENS = os.path.join(os.path.dirname(__file__), "data",
                        "fastnoiselite_goldens.npz")

_CONFIGS = {
    # the erosion_gpu.py terrain: shape 256², ext = simres*nscale/wscale
    "erosion_gpu_256": dict(shape=(256, 256), ext=(256.0, 256.0), seed=3.0),
    "default_ext_64x48": dict(shape=(64, 48), ext=(512.0, 512.0), seed=3.0),
    "odd_params": dict(shape=(32, 32), ext=(17.3, 29.1), seed=-2.5,
                       octaves=5, frequency=1.7, gain=0.45, lacunarity=2.3),
    "single_octave": dict(shape=(32, 32), ext=(32.0, 32.0), seed=0.0,
                          octaves=1),
}


@pytest.mark.parametrize("name", sorted(_CONFIGS))
def test_compat_noise_matches_fastnoiselite(name):
    cfg = dict(_CONFIGS[name])
    shape = cfg.pop("shape")
    want = np.load(_GOLDENS)[name]
    got = np.asarray(soil.noise(shape, soil.noise_t(**cfg)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_compat_is_the_default():
    assert soil.noise_t().compat is True
    # and the fast path is a different field with the same statistics class
    a = np.asarray(soil.noise((64, 64), soil.noise_t(ext=(64.0, 64.0))))
    b = np.asarray(
        soil.noise((64, 64), soil.noise_t(ext=(64.0, 64.0), compat=False))
    )
    assert (a != b).any()
    assert np.abs(a).max() <= 1.0 and np.abs(b).max() <= 1.0


def test_compat_noise_jits_and_is_deterministic():
    import jax

    p = soil.noise_t(ext=(48.0, 48.0), seed=7.0)

    @jax.jit
    def f():
        return soil.noise((48, 48), p)

    # Jit-compiled evaluation is bitwise deterministic call-to-call; the
    # jitted program may differ from eager by float32 roundoff (XLA fuses
    # multiply-adds differently inside jit), so that comparison is allclose.
    a, b = np.asarray(f()), np.asarray(f())
    np.testing.assert_array_equal(a, b)
    eager = np.asarray(soil.noise((48, 48), p))
    np.testing.assert_allclose(a, eager, atol=2e-3)


def test_os2_grad_decode_matches_table():
    """The arithmetic gradient decode (gather-free, see _os2_grad) must
    reproduce the vendored Gradients3D table for every index."""
    import jax.numpy as jnp

    from soillib_tpu.ops.noise import _OS2_GRADS

    gi = jnp.arange(64, dtype=jnp.int32)
    t = gi - 60
    m_tail = jnp.where(t == 0, 8, jnp.where(t == 1, 1, jnp.where(t == 2, 9, 3)))
    m = jnp.where(gi < 60, gi % 12, m_tail)
    g2 = m >> 2
    s0 = (1 - ((m & 1) << 1)).astype(jnp.float32)
    s1 = (1 - (m & 2)).astype(jnp.float32)
    zero = jnp.zeros_like(s0)
    gx = jnp.where(g2 == 0, zero, s0)
    gy = jnp.where(g2 == 0, s0, jnp.where(g2 == 2, s1, zero))
    gz = jnp.where(g2 == 2, zero, s1)
    dec = np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], -1)
    np.testing.assert_array_equal(dec, _OS2_GRADS)
