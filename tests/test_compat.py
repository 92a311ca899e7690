"""silt compatibility surface, morton indexing, metrics."""

import jax
import jax.numpy as jnp
import numpy as np

import soillib_tpu as soil
from soillib_tpu import silt
from soillib_tpu.core import metrics, morton


def test_silt_tensor_roundtrip():
    t = silt.tensor(silt.float32, silt.shape(8, 6))
    assert t.elem() == 48
    assert t.shape.dims == (8, 6)
    arr = np.arange(48, dtype=np.float32).reshape(8, 6)
    t2 = silt.tensor.from_numpy(arr)
    np.testing.assert_array_equal(t2.numpy(), arr)
    np.testing.assert_array_equal(t2.cpu().numpy(), arr)
    np.testing.assert_array_equal(t2.gpu().numpy(), arr)


def test_silt_elementwise_functional():
    t = silt.tensor.from_numpy(np.full((4, 4), 2.0, np.float32))
    t2 = silt.set(t, 5.0)
    assert float(t2.numpy().max()) == 5.0 and float(t.numpy().max()) == 2.0
    t3 = silt.add(silt.multiply(t2, 2.0), 1.0)
    assert float(t3.numpy().min()) == 11.0
    t4 = silt.clamp(t3, 0.0, 10.0)
    assert float(t4.numpy().max()) == 10.0
    t5 = silt.clone(t4)
    np.testing.assert_array_equal(t5.numpy(), t4.numpy())


def test_silt_rng_seed_deterministic():
    r = silt.tensor(silt.rng, silt.shape(4, 4))
    a = silt.seed(r, 7, offset=3)
    b = silt.seed(r, 7, offset=3)
    c = silt.seed(r, 7, offset=4)
    np.testing.assert_array_equal(a.numpy(), b.numpy())
    assert not np.array_equal(a.numpy(), c.numpy())


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, 256).astype(np.uint32)
    y = rng.integers(0, 1 << 16, 256).astype(np.uint32)
    code = morton.encode2(x, y)
    dx, dy = morton.decode2(code)
    np.testing.assert_array_equal(np.asarray(dx), x.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(dy), y.astype(np.int32))


def test_morton_locality():
    # consecutive codes along the curve stay spatially adjacent in quads
    assert int(morton.encode2(jnp.array([0]), jnp.array([0]))[0]) == 0
    assert int(morton.encode2(jnp.array([1]), jnp.array([0]))[0]) == 1
    assert int(morton.encode2(jnp.array([0]), jnp.array([1]))[0]) == 2
    assert int(morton.encode2(jnp.array([1]), jnp.array([1]))[0]) == 3


def test_metrics_mass_conservation_of_creep():
    """Creep alone conserves total mass exactly (erosion.cu symmetry)."""
    key = jax.random.PRNGKey(0)
    h = 2.0 + jax.random.normal(key, (24, 24))
    sed = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (24, 24))) * 0.1
    state = soil.ErosionState.zeros((24, 24), height=h, sediment=sed)
    scale = (0.1, 0.1, 2.0)
    before = metrics.mass_totals(state, scale)

    from soillib_tpu.models.erosion import mass_creep
    delta = jnp.zeros_like(state.layers)
    delta = mass_creep(delta, state.layers, scale, soil.ErosionParams())
    after_layers = state.layers + delta
    state2 = state.replace(layers=after_layers)
    after = metrics.mass_totals(state2, scale)

    np.testing.assert_allclose(
        float(after["sediment"] + after["bedrock"]),
        float(before["sediment"] + before["bedrock"]),
        rtol=1e-5,
    )
    s = metrics.summarize(state, scale)
    assert set(s) >= {"max_slope", "height_min", "height_max", "water"}
