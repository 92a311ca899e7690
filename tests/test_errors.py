"""API error paths: wrong inputs must fail loudly, mirroring the
reference's binding-level errors (silt::error, nanobind type checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import soillib_tpu as soil
from soillib_tpu import parallel as par


def test_invalid_edge_enum():
    h = jnp.ones((8, 8))
    with pytest.raises(ValueError):
        soil.steepest(h, 42)
    with pytest.raises(ValueError):
        soil.direction(h, -1)


def test_unknown_transport_method():
    st = soil.ErosionState.zeros((8, 8), height=jnp.ones((8, 8)))
    with pytest.raises(ValueError):
        soil.transport_fluvial(
            st.layers, st.rainfall, st.discharge, st.mass, st.momentum,
            st.albedo_surface, (0.1, 0.1, 1.0), soil.ErosionParams(),
            method="magic",
        )


def test_unknown_accumulate_method():
    h = jnp.ones((8, 8))
    flow = soil.steepest(h, soil.d8)
    with pytest.raises(ValueError):
        soil.accumulate(flow, h, soil.d8, method="nope")


def test_sharded_erosion_rejects_particles():
    mesh = par.make_mesh()
    p = soil.ErosionParams()
    p.transportMethod = "particles"
    with pytest.raises(ValueError):
        par.make_sharded_erode_fn(mesh, (0.1, 0.1, 1.0), p)


def test_layout_seam_fails_loudly():
    """Channel-layout misuse (the dem_mc_pod regression class) must raise
    a layout-naming error, not silently read garbage W/H."""
    from soillib_tpu.parallel.particles import solve_particles_sharded

    mesh = par.make_mesh()
    W = H = 8
    bad_flow = jnp.zeros((W, 2, H))  # channel-first by mistake
    src = jnp.ones((W, H))
    dec = jnp.zeros((W, H))
    with pytest.raises(ValueError, match="channel-LAST"):
        solve_particles_sharded(bad_flow, src, dec, (1.0, 1.0), 64,
                                jax.random.PRNGKey(0), mesh)
    with pytest.raises(ValueError, match="channel-LAST"):
        soil.solve_uniform(bad_flow, src, dec, (1.0, 1.0))
    # Mismatched source spatial shape also names the convention.
    good_flow = jnp.zeros((W, H, 2))
    with pytest.raises(ValueError, match="W, H"):
        solve_particles_sharded(good_flow, jnp.ones((H, 4)), dec,
                                (1.0, 1.0), 64, jax.random.PRNGKey(0), mesh)


def test_fluvial_sharded_rejects_channel_last_state():
    from soillib_tpu.parallel.particles import fluvial_particles_sharded

    mesh = par.make_mesh()
    st = soil.ErosionState.zeros((8, 8), height=jnp.ones((8, 8)))
    p = soil.ErosionParams()
    p.nSamples = 64
    bad_layers = jnp.moveaxis(st.layers, 0, -1)  # (W, H, 2) by mistake
    with pytest.raises(ValueError, match="channel-FIRST"):
        fluvial_particles_sharded(
            bad_layers, st.rainfall, st.discharge, st.momentum,
            st.albedo_surface, (0.5, 0.5, 2.0), p, jax.random.PRNGKey(0),
            mesh)


def test_distributed_accumulate_rejects_indivisible_grid():
    mesh = par.make_mesh()  # (2, 4)
    h = jnp.ones((10, 10))  # 10 % 4 != 0
    flow = soil.steepest(h, soil.d8)
    with pytest.raises(ValueError, match="not divisible"):
        par.graph.accumulate(flow, h, soil.d8, mesh=mesh)


def test_param_typo_rejected_but_aliases_work():
    p = soil.ErosionParams()
    with pytest.raises(AttributeError):
        p.suspenssionRateFluvial = 1.0
    p.critSlope = 0.4               # legacy alias
    assert p.critSlopeBedrock == 0.4
    with pytest.raises(AttributeError):
        _ = p.doesNotExist


def test_missing_tiff_file():
    with pytest.raises(FileNotFoundError):
        soil.tiff("/nonexistent/file.tif")


def test_halo_radius_exceeds_block():
    """Blocks narrower than the requested halo must fail with the clear
    message, not garbage exchange."""
    from jax import shard_map

    mesh = par.make_mesh()
    halo = par.ShardHalo(mesh.devices.shape, mesh.axis_names)
    spec = par.grid_spec(mesh)
    x = jnp.ones((8, 8))  # blocks (4, 2) on the (2, 4) mesh

    def local(x):
        return halo.crop(halo.pad(x, 0.0, radius=4), 4)

    with pytest.raises(ValueError, match="halo radius"):
        jax.jit(
            shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
        )(x)


def test_one_by_one_grid():
    """Degenerate 1x1 grids flow nowhere but do not crash."""
    h = jnp.ones((1, 1))
    assert int(soil.steepest(h, soil.d8)[0, 0]) == -1
    a = soil.accumulate(soil.steepest(h, soil.d8), h, soil.d8,
                        method="doubling")
    assert float(a[0, 0]) == 1.0
    out = soil.fill_depressions(h)
    assert float(out[0, 0]) == 1.0
