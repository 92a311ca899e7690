"""Transport parity study: converged particle-MC oracle vs the field solve.

The in-repo particle methods (models/erosion.py `_fluvial_particles` /
`_debris_particles`, ops/transport.py `_solve_particles`) are faithful
ports of the reference MC kernels (erosion.cu:29-141, 245-351); averaged
over enough particles/seeds they ARE the reference model's expectation.
This harness measures how closely the deterministic field solve tracks
that expectation — per output field, per terrain, cold and warm start,
single-phase and multi-step coupled — and reports the MC split-half noise
floor alongside so signal and noise are separable.

Usage:
  python benchmarks/parity.py --size 48 --seeds 32 --out /tmp/parity.json
  python benchmarks/parity.py --quick            # 1 terrain, few seeds
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


CROP = 4  # interior margin excluded from metrics (boundary effects)


# ---------------------------------------------------------------------------
# Terrains
# ---------------------------------------------------------------------------


def make_terrains(size, which=("ramp", "noise", "conditioned", "steep")):
    import soillib_tpu as soil

    W = H = size
    out = {}
    if "ramp" in which:
        # Smooth ramp with a mild cross-slope so the upwind split exercises
        # both axes (a pure-axis ramp hides direction errors).
        x = np.linspace(1.0, 0.0, W, dtype=np.float32)[:, None]
        y = np.linspace(0.15, 0.0, H, dtype=np.float32)[None, :]
        out["ramp"] = np.broadcast_to(x + y, (W, H)).astype(np.float32).copy()
    if "noise" in which:
        h = np.asarray(soil.noise((W, H), soil.noise_t(seed=3.0)))
        out["noise"] = (0.5 * h + 1.0).astype(np.float32)
    if "conditioned" in which:
        h = np.asarray(soil.noise((W, H), soil.noise_t(seed=7.0)))
        filled = np.asarray(soil.fill_depressions(0.5 * h + 1.0))
        out["conditioned"] = filled.astype(np.float32)
    if "steep" in which:
        # Amplified relief + ramp so slopes clear critSlopeBedrock and the
        # debris phase has structured spatial signal.
        h = np.asarray(soil.noise((W, H), soil.noise_t(seed=11.0)))
        x = np.linspace(1.5, 0.0, W, dtype=np.float32)[:, None]
        out["steep"] = (1.5 * h + x + 2.0).astype(np.float32)
    return out


def make_state(terrain, warm_steps, scale, param, seed=0):
    """Cold state (zeros) or a warm state advanced by `warm_steps` field
    steps — warm matters because discharge/momentum feed the attenuation
    and source terms of the next transport phase."""
    import soillib_tpu as soil

    state = soil.ErosionState.zeros(terrain.shape, height=terrain)
    if warm_steps:
        state = soil.erode(state, scale, param, steps=warm_steps,
                           key=jax.random.PRNGKey(seed))
    return state


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def _flat(a):
    a = np.asarray(a, np.float64)
    if a.ndim == 3:  # channel-first: crop spatial dims
        return a[:, CROP:-CROP, CROP:-CROP].reshape(-1)
    return a[CROP:-CROP, CROP:-CROP].reshape(-1)


def metrics(field_val, mc_val):
    """Relative mean error, Pearson correlation, normalized RMSE."""
    a, b = _flat(field_val), _flat(mc_val)
    mb = float(np.abs(b).mean())
    denom = mb if mb > 0 else 1.0
    rel_mean = float(abs(a.mean() - b.mean()) / denom)
    if a.std() == 0 or b.std() == 0:
        corr = 1.0 if np.allclose(a, b) else 0.0
    else:
        corr = float(np.corrcoef(a, b)[0, 1])
    nrmse = float(np.sqrt(((a - b) ** 2).mean()) / denom)
    return {"rel_mean": rel_mean, "corr": corr, "nrmse": nrmse}


def mc_average(fn, n_seeds, base_seed=0):
    """Average `fn(key) -> pytree` over seeds; returns (mean, half_a, half_b)
    so split-half self-correlation bounds the MC noise floor."""
    acc_a = acc_b = None
    jfn = jax.jit(fn)
    for s in range(n_seeds):
        out = jfn(jax.random.PRNGKey(base_seed + 1000 + s))
        tgt = "a" if s % 2 == 0 else "b"
        if tgt == "a":
            acc_a = out if acc_a is None else jax.tree.map(jnp.add, acc_a, out)
        else:
            acc_b = out if acc_b is None else jax.tree.map(jnp.add, acc_b, out)
    na, nb = (n_seeds + 1) // 2, n_seeds // 2
    half_a = jax.tree.map(lambda x: x / na, acc_a)
    half_b = jax.tree.map(lambda x: x / nb, acc_b) if nb else half_a
    mean = jax.tree.map(lambda a, b: (a * na + b * nb) / (na + nb),
                        half_a, half_b)
    return mean, half_a, half_b


# ---------------------------------------------------------------------------
# Single-phase comparisons
# ---------------------------------------------------------------------------

FLUVIAL_FIELDS = ("discharge", "mass", "momentum", "albedo")
DEBRIS_FIELDS = ("mass", "momentum", "albedo")


def _phase_report(names, f, mc, ha, hb, mass_idx):
    """Per-field metrics; the albedo ratio field is compared mass-weighted
    — the raw transported-albedo ratio G_a/G_m is degenerate wherever the
    mass flux is trace-level (the reference applies no floor either,
    erosion.cu:181-186), so cells below 1% of the mean MC mass carry no
    signal and are weighted out."""
    rep = {}
    for i, name in enumerate(names):
        if name == "albedo":
            # Weight by the LESSER of the two mass fields: the ratio is
            # only meaningful where both methods actually carry mass.
            wgt = np.minimum(
                np.maximum(np.asarray(mc[mass_idx], np.float64), 0.0),
                np.maximum(np.asarray(f[mass_idx], np.float64), 0.0),
            )
            thr = 0.01 * wgt.mean() if wgt.mean() > 0 else 0.0
            wgt = np.where(wgt > thr, wgt, 0.0)[None]
            rep[name] = metrics(np.asarray(f[i]) * wgt,
                                np.asarray(mc[i]) * wgt)
            rep[name]["mc_selfcorr"] = metrics(
                np.asarray(ha[i]) * wgt, np.asarray(hb[i]) * wgt
            )["corr"]
        else:
            rep[name] = metrics(f[i], mc[i])
            rep[name]["mc_selfcorr"] = metrics(ha[i], hb[i])["corr"]
    return rep


def compare_fluvial(state, scale, param, n_seeds):
    import soillib_tpu as soil

    args = (state.layers, state.rainfall, state.discharge, state.mass,
            state.momentum, state.albedo_surface, scale)

    f = soil.transport_fluvial(*args, param, method="field")
    mc, ha, hb = mc_average(
        lambda k: soil.transport_fluvial(*args, param, method="particles",
                                         key=k),
        n_seeds,
    )
    return _phase_report(FLUVIAL_FIELDS, f, mc, ha, hb, mass_idx=1)


def compare_debris(state, scale, param, n_seeds):
    import soillib_tpu as soil

    args = (state.layers, state.debris, state.debris_momentum,
            state.albedo_surface, scale)

    f = soil.transport_debris(*args, param, method="field")
    mc, ha, hb = mc_average(
        lambda k: soil.transport_debris(*args, param, method="particles",
                                        key=k),
        n_seeds,
    )
    return _phase_report(DEBRIS_FIELDS, f, mc, ha, hb, mass_idx=0)


# ---------------------------------------------------------------------------
# Multi-step coupled trajectories
# ---------------------------------------------------------------------------


def compare_coupled(terrain, scale, param, steps, n_rep=3):
    """Field-stepped vs particle-stepped coupled trajectories.

    The particle runs use distinct master seeds; their pairwise spread is
    the stochastic reference band the field trajectory must sit inside.
    Compared on the prognostic fields after `steps` coupled steps."""
    import soillib_tpu as soil

    pf = param.replace(transportMethod="field")
    pp = param.replace(transportMethod="particles")

    sf = make_state(terrain, 0, scale, pf)
    f_out = soil.erode(sf, scale, pf, steps=steps, key=jax.random.PRNGKey(0))

    p_outs = []
    for r in range(n_rep):
        sp = make_state(terrain, 0, scale, pp)
        p_outs.append(
            soil.erode(sp, scale, pp, steps=steps,
                       key=jax.random.PRNGKey(100 + r))
        )

    rep = {}
    for name in ("height", "discharge", "mass", "momentum", "debris"):
        get = lambda st: getattr(st, name)
        vs_mc = [metrics(get(f_out), get(po)) for po in p_outs]
        mc_spread = [
            metrics(get(p_outs[i]), get(p_outs[j]))
            for i in range(n_rep) for j in range(i + 1, n_rep)
        ]
        rep[name] = {
            "field_vs_mc_relmean": float(np.mean([m["rel_mean"] for m in vs_mc])),
            "field_vs_mc_corr": float(np.mean([m["corr"] for m in vs_mc])),
            "mc_vs_mc_relmean": float(np.mean([m["rel_mean"] for m in mc_spread])),
            "mc_vs_mc_corr": float(np.mean([m["corr"] for m in mc_spread])),
        }
    return rep


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--nsamples", type=int, default=0,
                    help="particles per seed (default W*H*16)")
    ap.add_argument("--maxage", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20, help="coupled steps")
    ap.add_argument("--coupled-nsamples", type=int, default=0,
                    help="particles per coupled step (default W*H*64)")
    ap.add_argument("--terrains", default="ramp,noise,conditioned,steep")
    ap.add_argument("--nodes", type=int, default=1,
                    help="face-routed mixture nodes (quality mode; "
                         "CohortClosure.nodes)")
    ap.add_argument("--colors", type=int, default=1,
                    help="colored birth sub-ensembles (quality mode; "
                         "CohortClosure.colors)")
    ap.add_argument("--color-rule", default="hash", choices=("hash", "dir"))
    ap.add_argument("--skip-coupled", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import soillib_tpu as soil

    if args.quick:
        args.seeds, args.steps = 8, 8
        args.terrains = "ramp"

    scale = (0.078, 0.078, 4.0)
    size = args.size
    param = soil.ErosionParams()
    param.maxage = args.maxage
    # Field rounds == particle deposit opportunities: the MC loop runs
    # maxage-1 iterations, the first of which never deposits (the particle
    # is still inside its birth cell), so maxage-2 transit deposits.
    param.transportIterations = args.maxage - 2
    param.nSamples = args.nsamples or size * size * 16
    param.timeStep = 500.0  # visible terrain change within few steps
    if args.nodes > 1 or args.colors > 1:
        from soillib_tpu.ops.cohort import CohortClosure

        param.closure = CohortClosure(nodes=args.nodes, colors=args.colors,
                                      color_rule=args.color_rule)

    terrains = make_terrains(size, tuple(args.terrains.split(",")))
    report = {"config": {k: getattr(args, k) for k in
                         ("size", "seeds", "maxage", "steps",
                          "nodes", "colors")},
              "nsamples": param.nSamples}

    for tname, terr in terrains.items():
        report[tname] = {}
        for regime, warm in (("cold", 0), ("warm", 8)):
            st = make_state(terr, warm, scale, param)
            rep_f = compare_fluvial(st, scale, param, args.seeds)
            rep_d = compare_debris(st, scale, param, args.seeds)
            report[tname][regime] = {"fluvial": rep_f, "debris": rep_d}
            print(f"== {tname}/{regime} ==")
            for phase, rep in (("fluvial", rep_f), ("debris", rep_d)):
                for fld, m in rep.items():
                    print(f"  {phase:8s} {fld:9s} rel_mean={m['rel_mean']:.4f} "
                          f"corr={m['corr']:.4f} nrmse={m['nrmse']:.4f} "
                          f"(mc self-corr {m['mc_selfcorr']:.4f})")

    if not args.skip_coupled:
        pc = param.replace(
            nSamples=args.coupled_nsamples or size * size * 64
        )
        for tname, terr in terrains.items():
            rep = compare_coupled(terr, scale, pc, args.steps)
            report[tname]["coupled"] = rep
            print(f"== {tname}/coupled x{args.steps} ==")
            for fld, m in rep.items():
                print(f"  {fld:9s} field-vs-mc rel={m['field_vs_mc_relmean']:.4f} "
                      f"corr={m['field_vs_mc_corr']:.4f} | mc-vs-mc "
                      f"rel={m['mc_vs_mc_relmean']:.4f} corr={m['mc_vs_mc_corr']:.4f}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
