"""Weak-scaling harness: coupled erosion step, 1 chip → N devices/hosts.

The BASELINE.md target is ≥80% weak-scaling efficiency with 2-D block
decomposition and halo exchange over ICI. This harness fixes the PER-DEVICE
block size and grows the global grid with the mesh, reporting cell-steps/s
and efficiency vs the single-device run.

Real pod:   launched per host after jax.distributed.initialize()
Structure:  --virtual N runs the same code on N CPU devices (numbers are
            not meaningful there; use it to validate the harness itself).

    python benchmarks/scaling.py [--block 1024] [--steps 4] [--virtual 8]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=1024, help="per-device block edge")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--virtual", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)
    import jax.numpy as jnp

    import soillib_tpu as soil
    from soillib_tpu import parallel as par

    def sync(state):
        jax.block_until_ready(state)
        float(jnp.asarray(state.discharge).ravel()[0])

    def run(devices):
        mesh = par.make_mesh(devices=devices)
        px, py = mesh.devices.shape
        W, H = px * args.block, py * args.block
        scale = (20.0 / W, 20.0 / H, 4.0)
        param = soil.ErosionParams()
        param.transportIterations = args.iters
        height = soil.noise((W, H), soil.noise_t(seed=3.0, ext=(W, H)))
        state = par.shard_state(soil.ErosionState.zeros((W, H), height=height), mesh)
        step = par.make_sharded_erode_fn(mesh, scale, param, steps=args.steps)
        key = jax.random.PRNGKey(0)
        state = step(state, key)
        sync(state)
        t0 = time.perf_counter()
        state = step(state, key)
        sync(state)
        dt = time.perf_counter() - t0
        return W * H * args.steps / dt  # cell-steps/s

    import numpy as np
    devs = jax.devices()
    results = {}
    n = 1
    while n <= len(devs):
        rate = run(np.array(devs[:n]))
        results[n] = rate
        eff = rate / (n * results[1])
        print(json.dumps({
            "devices": n,
            "cell_steps_per_s": round(rate, 1),
            "per_device": round(rate / n, 1),
            "weak_scaling_efficiency": round(eff, 4),
        }))
        n *= 2


if __name__ == "__main__":
    main()
