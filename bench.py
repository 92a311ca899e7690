"""Headline benchmark: coupled erosion step throughput (grid-points/s/chip).

Config is the BASELINE.md north star: 4096² grid, full coupled step
(fluvial + debris transport @ 32 upwind rounds each, mass transfer, creep),
single chip. The reference publishes no numbers (BASELINE.md), so
`vs_baseline` is reported against the *HBM speed-of-light* for the step: an
analytic minimum-traffic byte model of the fused step divided by the chip's
measured stream bandwidth (self-calibrated each run with a saxpy sweep).
vs_baseline == 1.0 would mean the step runs at memory speed-of-light.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gridpoint-steps/s", "vs_baseline": N}
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure_stream_bw(n_bytes=1 << 28, reps=50):
    """Achievable HBM bandwidth via y = ax + b, `reps` iterations inside ONE
    compiled loop (per-dispatch tunnel latency would otherwise dominate)."""
    n = n_bytes // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(
            0, reps, lambda i, y: y * 1.0000001 + 0.001, x
        )

    _sync(loop(x))
    t0 = time.perf_counter()
    _sync(loop(x))
    dt = time.perf_counter() - t0
    return reps * 2 * n * 4 / dt  # bytes/s (read + write)


def _sync(x):
    """True device sync: pull one element to host. block_until_ready alone
    does not flush the async dispatch queue on the tunneled TPU platform."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.block_until_ready(x)
    float(jnp.asarray(leaf).ravel()[0])


def step_bytes_per_cell(iters: int) -> float:
    """Minimum HBM traffic per cell per coupled step with the temporally-
    blocked Pallas sweep (ops/sweep.py, K=16 rounds per HBM pass): each
    pass reads G/E/att windows (+vx, vy), re-pads and writes G; fluvial
    carries 7 channels, debris 6; plus ~40 float32 field touches for
    terms/normalize/transfer/creep."""
    from soillib_tpu.ops.sweep import HALO_K

    passes = -(-iters // HALO_K)

    def transport(C):
        per_pass = (3 * C + 2) * 4        # window reads
        per_pass += C * 4                 # G write-back
        per_pass += 2 * C * 4             # G re-pad copy (read + write)
        return passes * per_pass

    rest = 40 * 4
    return transport(7) + transport(6) + rest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=0, help="grid edge (default 4096 tpu / 256 cpu)")
    ap.add_argument("--iters", type=int, default=32, help="transport rounds")
    ap.add_argument("--steps", type=int, default=8, help="timed steps")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    size = args.size or (4096 if platform == "tpu" else 256)

    import soillib_tpu as soil

    W = H = size
    scale = (0.078, 0.078, 4.0)
    height = soil.noise((W, H), soil.noise_t()) * 0.5 + 1.0
    state = soil.ErosionState.zeros((W, H), height=height)
    param = soil.ErosionParams()
    param.transportIterations = args.iters

    step = soil.make_erode_fn(param, scale, steps=1)
    key = jax.random.PRNGKey(0)

    state = step(state, key)  # compile + 1 step
    _sync(state)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step(state, key)
    _sync(state)
    dt = time.perf_counter() - t0

    cells = W * H
    value = args.steps * cells / dt

    bw = measure_stream_bw()
    sol = bw / step_bytes_per_cell(args.iters)  # speed-of-light cell-steps/s
    print(
        json.dumps(
            {
                "metric": f"coupled erosion grid-point-steps/s/chip @{W}x{H}, {args.iters} transport rounds",
                "value": round(value, 1),
                "unit": "gridpoint-steps/s",
                "vs_baseline": round(value / sol, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
