"""Regenerate the golden-net artifacts in tests/data (run on CPU).

Produces:
  golden_dem.tif        — 256² conditioned-noise DEM written through the
                          GeoTIFF codec (the pipeline golden reads it back,
                          so codec drift is caught too).
  golden_pipeline.npz   — stats + 32×32 block-mean fingerprint of the
                          dem_process pipeline (fill_depressions ->
                          steepest -> accumulate_decay) on that DEM.
  golden_traj128.npz    — stats + 16×16 block-mean fingerprints after 30
                          coupled erosion steps @128².
  golden_traj256.npz    — same after 100 steps @256² (slow test).

Usage: PYTHONPATH=. python tools/gen_goldens.py [--skip-slow]
"""

import argparse
import os

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import soillib_tpu as soil  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def block_means(a, k):
    W, H = a.shape
    return np.asarray(a).reshape(W // k, k, H // k, k).mean(axis=(1, 3))


def gen_dem_pipeline():
    h = jnp.asarray(
        soil.noise((256, 256), soil.noise_t(seed=9.0, ext=(256.0, 256.0)))
    ) * 40.0 + 100.0
    g = soil.geotiff(np.asarray(h))
    g.meta.scale = [0.25, 0.25, 1.0]
    g.write(os.path.join(DATA, "golden_dem.tif"))

    r = soil.geotiff()
    r.read(os.path.join(DATA, "golden_dem.tif"))
    dem = r.tensor

    filled = soil.fill_depressions(dem)
    flow = soil.steepest(filled, soil.d8)
    acc = soil.accumulate_decay(flow, jnp.ones_like(dem), 0.9, soil.d8)

    acc_np = np.asarray(acc)
    np.savez(
        os.path.join(DATA, "golden_pipeline.npz"),
        fill_delta_sum=np.float64(np.asarray(filled - dem).sum()),
        n_roots=np.int64((np.asarray(flow) < 0).sum()),
        acc_mean=np.float64(acc_np.mean()),
        acc_max=np.float64(acc_np.max()),
        acc_blocks=block_means(acc_np, 8),
    )
    print("pipeline golden:", acc_np.mean(), acc_np.max())


def gen_traj(n, steps, out):
    param = soil.ErosionParams()
    param.transportIterations = 16
    scale = (0.1, 0.1, 4.0)
    h = jnp.asarray(
        soil.noise((n, n), soil.noise_t(seed=5.0, ext=(float(n),) * 2))
    ) * 0.5 + 2.0
    state = soil.ErosionState.zeros((n, n), height=h)
    state = soil.erode(state, scale, param, steps=steps,
                       key=jax.random.PRNGKey(3))
    height = np.asarray(state.height)
    dis = np.asarray(state.discharge)
    sed = np.asarray(state.sediment)
    np.savez(
        os.path.join(DATA, out),
        height_stats=np.array([height.mean(), height.std(),
                               np.abs(height).max()]),
        discharge_stats=np.array([dis.mean(), dis.std(), np.abs(dis).max()]),
        sediment_stats=np.array([sed.mean(), sed.std(), np.abs(sed).max()]),
        height_blocks=block_means(height, n // 16),
        discharge_blocks=block_means(dis, n // 16),
    )
    print(out, ":", height.mean(), dis.mean())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-slow", action="store_true")
    args = ap.parse_args()
    gen_dem_pipeline()
    gen_traj(128, 30, "golden_traj128.npz")
    if not args.skip_slow:
        gen_traj(256, 100, "golden_traj256.npz")
