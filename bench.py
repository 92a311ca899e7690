"""Headline benchmark: coupled erosion step throughput (grid-points/s/chip).

Config is the BASELINE.md north star: 4096² grid, full coupled step
(fluvial + debris age-structured cohort transport @ 32 rounds each, mass
transfer, creep), single chip. The reference publishes no numbers
(BASELINE.md), so `vs_baseline` is reported against the step's own
*speed-of-light*: the lower of

  * HBM roofline — an analytic minimum-traffic byte model of the
    temporally-blocked cohort passes divided by measured stream bandwidth
    (self-calibrated each run with an in-jit saxpy loop), and
  * compute roofline — the per-cell-round VPU op count of the actual
    cohort round (counted mechanically from its jaxpr, with measured
    fma-equivalent cost weights for exp/div/sqrt/pow) divided by the
    measured VPU f32 throughput (self-calibrated with an in-jit fma loop).

Both ceilings are deliberately optimistic (minimum traffic; transport
flops only — the ~5% non-transport step work is excluded), so
vs_baseline == 1.0 is a true speed-of-light and the number cannot
flatter the implementation.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gridpoint-steps/s", "vs_baseline": N}
plus a human-readable roofline breakdown on stderr.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    """True device sync: pull one element to host. block_until_ready alone
    does not flush the async dispatch queue on the tunneled TPU platform."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.block_until_ready(x)
    float(jnp.asarray(leaf).ravel()[0])


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


_VPU_SHAPE = (8, 1024)  # small block: per-op vreg count low, issue-bound
_VPU_K = 4              # independent chains (ILP) carried across rounds
_VPU_U = 16             # ops per chain per round (amortize loop carry)

# Elementwise-op/s ceiling by device kind: VPU issue slots x (8, 128)
# lanes x clock. No synthetic probe sustains this (best measured: pure
# fma chains 0.87e12, mixed-op chains 1.01e12 on v5e — see RESULTS.md),
# but the REAL cohort kernel demonstrably executes ~2.05e12 counted
# fma-eq/s (multi-slot co-issue on its heterogeneous op mix), so any
# measured-probe ceiling would sit BELOW demonstrated hardware behavior
# and flatter vs_baseline (it read 1.63 under a probe-based ceiling).
# The spec number is the one ceiling that is neither circular (derived
# from the kernel under test) nor demonstrably too low.
_VPU_SPEC_OPS = {
    "TPU v5 lite": 4 * 8 * 128 * 0.94e9,   # v5e: 3.85e12
    "TPU v5": 4 * 8 * 128 * 0.94e9,
    "TPU v4": 4 * 8 * 128 * 1.05e9,
    "TPU v6 lite": 4 * 8 * 128 * 1.7e9,
}


def _vpu_chain_time(op, reps, interpret, timings=3):
    """Seconds for `reps` rounds of `_VPU_K` independent chains, each
    applying `op` `_VPU_U` times per round, over a VMEM-resident f32
    block inside ONE Pallas kernel (an XLA fori_loop would materialize
    the carry through HBM each round and measure bandwidth, not the VPU).

    No in-loop reduction: a k-wide reduce inside the round serializes on
    the accumulator chain and measures add LATENCY (~0.47 T/s on v5e vs
    ~0.87 T/s for this shape). Takes the MIN over `timings` repeats: the
    per-op cost weights are RATIOS of these times, and a single noisy
    dispatch through the shared-chip tunnel otherwise swings the compute
    roofline — and vs_baseline — by 2x between runs."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        ys = tuple(x_ref[...] * (1.0 + 0.001 * i) for i in range(_VPU_K))

        def body(_, ys):
            ys = list(ys)
            for _ in range(_VPU_U):
                ys = [op(y) for y in ys]
            return tuple(ys)

        ys = jax.lax.fori_loop(0, reps, body, ys)
        acc = ys[0]
        for y in ys[1:]:
            acc = acc + y
        o_ref[...] = acc

    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(_VPU_SHAPE, jnp.float32),
            interpret=interpret,
        )(x)
    )
    x = jnp.full(_VPU_SHAPE, 0.5, jnp.float32)
    _sync(f(x))
    best = float("inf")
    for _ in range(timings):
        t0 = time.perf_counter()
        _sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_vpu():
    """Elementwise-op/s ceiling and per-op cost weights for the roofline.

    Returns (ops_per_s, {op: cost}): ops_per_s = max(measured fma-chain
    probe, device-spec peak) — see _VPU_SPEC_OPS for why spec — and cost
    is the measured throughput of exp/div/sqrt relative to fma (~1-1.5
    on TPU: hardware approximations + --xla_allow_excess_precision)."""
    interpret = jax.devices()[0].platform != "tpu"
    # reps sized so one kernel runs ~60-100 ms on hardware: the ~5 ms
    # tunnel dispatch jitter must be small against the thing measured.
    n = _VPU_SHAPE[0] * _VPU_SHAPE[1]
    reps = 4 if interpret else max(1, (1 << 36) // (n * _VPU_K * _VPU_U))
    per_round = _VPU_K * _VPU_U

    dt_fma = _vpu_chain_time(lambda y: y * 1.0000001 + 1e-9, reps, interpret)
    probe = per_round * n * reps / dt_fma
    kind = jax.devices()[0].device_kind
    spec = 0.0
    for k, v in _VPU_SPEC_OPS.items():
        if kind.startswith(k):
            spec = max(spec, v)
    if spec == 0.0 and not interpret:
        print(
            f"[roofline] WARNING: device kind {kind!r} not in _VPU_SPEC_OPS;"
            f" falling back to the fma-chain probe ceiling, which sits BELOW"
            f" demonstrated co-issue throughput — vs_baseline may exceed 1.0"
            f" and is not comparable across chip generations",
            file=sys.stderr,
        )
    ops_rate = max(probe, spec)

    # Per-op cost c: each op body iteration is 1 op-under-test + 1
    # stabilizing unit op, timed against a 2-unit-op fma body, so
    # dt_op / dt_fma2 = (c + 1) / 2  =>  c = 2 dt_op/dt_fma2 - 1.
    dt_fma2 = _vpu_chain_time(
        lambda y: (y * 1.0000001 + 1e-9) * 0.9999999 + 1e-9,
        reps // 2 + 1, interpret)
    half = reps // 2 + 1

    def cost(op):
        dt = _vpu_chain_time(op, half, interpret)
        # body = op + 1 plain op; fma2 body = 2 plain ops.
        return max(1.0, 2.0 * dt / dt_fma2 - 1.0)

    costs = {
        "exp": cost(lambda y: jnp.exp(-y) + 0.1),
        "div": cost(lambda y: 1.5 / (y + 1.0)),
        "sqrt": cost(lambda y: jnp.sqrt(y + 0.25)),
    }
    return ops_rate, costs


# Elementwise primitive -> fma-equivalent weight class. Data movement
# (concatenate from rolls, select) counts 1: it occupies a VPU/VMEM slot
# per element even though it does no arithmetic.
_SIMPLE = {
    "add", "sub", "mul", "max", "min", "neg", "abs", "sign", "floor",
    "and", "or", "xor", "not", "lt", "le", "gt", "ge", "eq", "ne",
    "select_n", "clamp", "concatenate", "rev", "convert_element_type",
    "stop_gradient", "integer_pow", "is_finite", "shift_right_logical",
    "shift_left", "rem",
}
_WEIGHTED = {"exp": "exp", "log": "exp", "exp2": "exp", "log2": "exp",
             "tanh": "exp", "div": "div", "sqrt": "sqrt", "rsqrt": "sqrt",
             "pow": "exp"}
_FREE = {"broadcast_in_dim", "reshape", "squeeze", "slice", "copy",
         "reduce_max", "reduce_min", "reduce_sum", "reduce_and",
         "reduce_or", "transpose", "iota", "pad", "dynamic_slice",
         "dynamic_update_slice", "bitcast_convert_type", "custom_jvp_call",
         "custom_vjp_call", "pjit", "closed_call", "remat", "while", "scan",
         "cond"}


def _count_ops(jaxpr, costs, n_cells):
    """Weighted VPU op count of a jaxpr (recursing into calls), with a
    local value-numbering CSE so duplicated subexpressions — which XLA
    deduplicates before lowering — are not double-counted (counting them
    would understate the speed-of-light and flatter vs_baseline)."""
    import numpy as np
    try:
        from jax.extend.core import Literal
    except ImportError:  # older jax
        from jax.core import Literal

    total = 0.0
    canon = {}
    seen = {}

    def cid(v):
        if isinstance(v, Literal):
            val = np.asarray(v.val)
            return ("lit", val.tobytes() if val.size <= 16 else id(v))
        return canon.get(v, v)

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        sub = [v for k, v in eqn.params.items()
               if k in ("jaxpr", "call_jaxpr", "branches", "cond_jaxpr",
                        "body_jaxpr")]
        if sub:
            for s in sub:
                core = getattr(s, "jaxpr", s)
                if isinstance(core, (list, tuple)):
                    for c in core:
                        total += _count_ops(getattr(c, "jaxpr", c), costs,
                                            n_cells)
                else:
                    total += _count_ops(core, costs, n_cells)
            continue
        if not eqn.outvars:
            continue
        if prim in _SIMPLE or prim in _WEIGHTED:
            try:
                key = (prim, tuple(cid(v) for v in eqn.invars),
                       str(sorted(eqn.params.items())))
            except Exception:
                key = None
            if key is not None:
                if key in seen:
                    for ov, prev in zip(eqn.outvars, seen[key]):
                        canon[ov] = prev
                    continue
                seen[key] = [cid(ov) for ov in eqn.outvars]
        size = 0
        for ov in eqn.outvars:
            aval = ov.aval
            k = 1
            for d in getattr(aval, "shape", ()):
                k *= d
            size = max(size, k)
        if prim in _SIMPLE:
            total += size
        elif prim in _WEIGHTED:
            total += size * costs[_WEIGHTED[prim]]
        # everything else (layout/control/reduce) ~free at this granularity
    return total


def cohort_round_ops(costs, albedo_on=True):
    """Per-cell fma-equivalent op count of ONE fluvial + ONE debris cohort
    round — the body the Pallas kernel iterates, counted from the traced
    jaxpr of the REAL model closures (models/erosion.py
    make_fluvial_rules / make_debris_rules + ops/cohort.py cohort_round).
    `albedo_on` must match the benchmarked config: with trackAlbedo off
    the solves carry 3 fewer channels each, and a ceiling modeled on the
    heavier workload would flatter vs_baseline."""
    from soillib_tpu.models.erosion import make_debris_rules, \
        make_fluvial_rules
    from soillib_tpu.models.params import ErosionParams
    from soillib_tpu.ops import cohort as co

    W, H = 8, 128
    n_cells = W * H
    p = ErosionParams()
    p.trackAlbedo = albedo_on
    Llen = 0.11
    total = {}
    for phase, (C, A, rules) in {
        "fluvial": (7 if albedo_on else 4, 1, make_fluvial_rules(p, Llen)),
        "debris": (6 if albedo_on else 3, 1, make_debris_rules(p, Llen, 1.0)),
    }.items():
        S = co.NSTATE + C
        st = jnp.ones((S, W, H), jnp.float32)
        G = jnp.zeros((C, W, H), jnp.float32)
        aux = jnp.ones((3 + A, W, H), jnp.float32)
        jaxpr = jax.make_jaxpr(
            lambda st, G, aux, rules=rules: co.cohort_round(
                st, G, aux, rules, Llen, co.shift_push
            )
        )(st, G, aux)
        total[phase] = _count_ops(jaxpr.jaxpr, costs, n_cells) / n_cells
    return total


def step_bytes_per_cell(iters: int, albedo_on=True, grid=None) -> float:
    """Minimum HBM traffic per cell per coupled step with the temporally-
    blocked cohort passes (ops/cohort.py, K=16 rounds per pass): each pass
    reads the (NSTATE+C)-channel state window, the (3+A)-channel aux
    window and
    the old C-channel deposit tile, writes the state interior and the
    updated deposits (aliased in place), and the scan carry update copies
    the state interior back into the padded buffer (read + write); plus
    ~40 float32 field touches for terms/normalize/transfer/creep."""
    from soillib_tpu.ops.cohort import NSTATE, choose_geometry

    def cohort(C, A):
        S = NSTATE + C
        # K is geometry-dependent now (choose_geometry shrinks the
        # window — and may shrink K — as the state grows; the round-3
        # fixed-K model undercounted passes for fat states). Pass the
        # grid so the modeled K matches the kernel's actual choice.
        k = choose_geometry(S, 3 + A, C, grid=grid).k
        passes = -(-iters // k)
        per_pass = (S + (3 + A) + C) * 4  # window + old-G reads
        per_pass += (S + C) * 4           # state + deposit write-back
        per_pass += 2 * S * 4             # carry update copy
        return passes * per_pass

    rest = 40 * 4
    if albedo_on:
        return cohort(7, 1) + cohort(6, 1) + rest
    return cohort(4, 1) + cohort(3, 1) + rest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=0,
                    help="grid edge (default 4096 tpu / 256 cpu)")
    ap.add_argument("--iters", default="32",
                    help="transport rounds (int), or 'auto' = the "
                         "reference-faithful depth (maxage-2 = 510 rounds, "
                         "erosion.cu:101) with the convergence-adaptive "
                         "exit (transportTol=1e-6): rounds run only while "
                         "cohorts still carry deposit mass")
    ap.add_argument("--steps", type=int, default=8, help="timed steps")
    ap.add_argument("--albedo", choices=("on", "off"), default="on",
                    help="albedo instrumentation (off = 8192² capacity "
                         "mode: 3 fewer carried channels per transport "
                         "solve, albedo state stays constant)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    size = args.size or (4096 if platform == "tpu" else 256)

    import soillib_tpu as soil

    W = H = size
    scale = (0.078, 0.078, 4.0)
    height = soil.noise((W, H), soil.noise_t()) * 0.5 + 1.0
    # Constant fields as broadcastable (1, 1) scalars: rainfall, uplift and
    # bedrock albedo pass through the step unchanged, so full-grid copies
    # of them are pure HBM waste (1.25 GB of arguments + as much again in
    # pass-through output copies at 8192² — the margin it OOM'd by).
    state = soil.ErosionState.zeros((W, H), height=height, rainfall=1.0,
                                    uplift=0.0,
                                    albedo_bedrock=(1.0, 1.0, 1.0),
                                    albedo_surface=(1.0, 1.0, 1.0))
    del height  # 256 MB at 8192² — every buffer counts against HBM
    param = soil.ErosionParams()
    auto = args.iters == "auto"
    if auto:
        # Reference-faithful depth: transportIterations=0 -> maxage-2 =
        # 510 rounds as the UPPER bound; the adaptive exit turns dead
        # rounds (the reason the reference's fixed bound is affordable
        # on GPU but not on TPU) into skipped passes.
        param.transportIterations = 0
        param.transportTol = 1e-6
        iters_n = max(param.maxage - 2, 1)
    else:
        param.transportIterations = iters_n = int(args.iters)
    param.trackAlbedo = args.albedo == "on"

    step = soil.make_erode_fn(param, scale, steps=1)
    key = jax.random.PRNGKey(0)

    # Warm up until the state's leaf shapes stabilize: with albedo
    # tracked, the first call broadcasts (3, 1, 1) constant albedo fields
    # to full size, so the SECOND call compiles a second program — which
    # must not land inside the timed window (a remote compile-cache fetch
    # there once read as a 10x regression in code that did not change).
    for _ in range(3):
        shapes = jax.tree_util.tree_map(jnp.shape, state)
        state = step(state, key)  # compile + 1 step
        _sync(state)
        if jax.tree_util.tree_map(jnp.shape, state) == shapes:
            break

    # Time GROUPS of steps and take the best group: the chip is shared
    # through the tunnel, and a transient co-tenant (observed: stream bw
    # halved for minutes at a time) otherwise reports a 10x-low number
    # for code that did not change. Best-of-N measures the code, not the
    # neighbor.
    groups = max(1, args.steps // 4)
    per_group = args.steps // groups
    best_dt = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(per_group):
            state = step(state, key)
        _sync(state)
        best_dt = min(best_dt, time.perf_counter() - t0)

    cells = W * H
    value = per_group * cells / best_dt

    # Shared-chip tunnel runs are noisy; the CEILING wants the best
    # achievable number, so take the max over repeats.
    bw = max(measure_stream_bw() for _ in range(3))
    albedo_on = args.albedo == "on"
    hbm_sol = bw / step_bytes_per_cell(iters_n, albedo_on, (W, H))

    vpu_ops, costs = measure_vpu()
    round_ops = cohort_round_ops(costs, albedo_on)
    ops_per_cell_step = (round_ops["fluvial"] + round_ops["debris"]) \
        * iters_n
    # Both sides are weighted elementwise ops (fma-equivalents).
    compute_sol = vpu_ops / ops_per_cell_step

    sol = min(hbm_sol, compute_sol)
    print(
        f"[roofline] stream bw {bw/1e9:.0f} GB/s, "
        f"bytes/cell-step {step_bytes_per_cell(iters_n, albedo_on, (W, H)):.0f} "
        f"-> HBM SoL {hbm_sol/1e6:.1f} M/s | "
        f"VPU {vpu_ops/1e12:.2f} Top/s "
        f"(exp {costs['exp']:.1f}, div {costs['div']:.1f}, "
        f"sqrt {costs['sqrt']:.1f} fma-eq), "
        f"round ops/cell: fluvial {round_ops['fluvial']:.0f} + "
        f"debris {round_ops['debris']:.0f} "
        f"-> compute SoL {compute_sol/1e6:.1f} M/s | "
        f"binding: {'HBM' if hbm_sol < compute_sol else 'VPU'}",
        file=sys.stderr,
    )
    depth = f"auto(<={iters_n})" if auto else str(iters_n)
    # Schema continuity (VERDICT r2 weak #5): the raw value plus BOTH
    # ceilings and their measured inputs ride in the JSON, so a change in
    # what vs_baseline divides by can never silently re-base the
    # round-over-round trend — vs_baseline = value / min(hbm_sol,
    # compute_sol) is recomputable from the artifact alone.  In auto
    # mode the ceilings are modeled at the FULL fixed depth while the
    # adaptive solve executes only the rounds that still move mass, so
    # vs_baseline > 1 there measures the algorithmic win over a
    # fixed-depth speed-of-light implementation, not a broken ceiling.
    print(
        json.dumps(
            {
                "metric": f"coupled erosion grid-point-steps/s/chip "
                          f"@{W}x{H}, {depth} transport rounds",
                "value": round(value, 1),
                "unit": "gridpoint-steps/s",
                "vs_baseline": round(value / sol, 4),
                "hbm_sol": round(hbm_sol, 1),
                "compute_sol": round(compute_sol, 1),
                "bw_bytes_per_s": round(bw, 1),
                "bytes_per_cell_step": round(
                    step_bytes_per_cell(iters_n, albedo_on, (W, H)), 1
                ),
                "vpu_ops_per_s": round(vpu_ops, 1),
                "vpu_ops_per_cell_step": round(ops_per_cell_step, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
