"""Per-step scalar diagnostics (SURVEY.md §5: metrics / observability).

The reference's only metric is wall time (`soil.timer`). These add the
physically meaningful invariants worth watching in long runs — all jittable
reductions over the state pytree, cheap enough to fold into a step.
"""

from __future__ import annotations

import jax.numpy as jnp

from soillib_tpu.models.erosion import godunov_gradient, merged_height


def mass_totals(state, scale):
    """Total bedrock / sediment / suspended / debris volume [length^3]."""
    sx, sy, sz = float(scale[0]), float(scale[1]), float(scale[2])
    A = sx * sy
    return {
        "bedrock": jnp.sum(state.layers[0]) * sz * A,
        "sediment": jnp.sum(state.layers[1]) * sz * A,
        "suspended": jnp.sum(state.mass) * A,
        "debris": jnp.sum(state.debris) * A,
        "water": jnp.sum(state.discharge) * A,
    }


def max_slope(state, scale, exit_slope: float = 0.0):
    """Steepest Godunov slope magnitude [m/m] — the stability-relevant one
    (the transfer clamps scale with it, erosion.cu:527)."""
    g = godunov_gradient(merged_height(state.layers), scale, exit_slope)
    return jnp.max(jnp.sqrt(g[0] ** 2 + g[1] ** 2))


def summarize(state, scale):
    """One scalar dict per step: mass totals + max slope + extrema."""
    out = mass_totals(state, scale)
    out["max_slope"] = max_slope(state, scale)
    h = state.height
    out["height_min"] = jnp.min(h)
    out["height_max"] = jnp.max(h)
    return out


def throughput(cells: int, steps: int, seconds: float) -> float:
    """Grid-point-steps per second (the BASELINE.md headline unit)."""
    return cells * steps / seconds
