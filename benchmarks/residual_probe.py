"""Single-origin residual probe: is the closure residual cross-origin
pooling (colors can fix) or SELF-merging of one origin's flow (no birth
partition can)? Rainfall restricted to one 4x4 patch on the noise
terrain; field vs converged MC discharge."""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "benchmarks"))
import parity
import soillib_tpu as soil

terr = parity.make_terrains(48, ("noise",))["noise"]
state = soil.ErosionState.zeros((48, 48), height=terr)
scale = (0.078, 0.078, 4.0)
p = soil.param_t(); p.maxage = 128; p.timeStep = 500.0
p.nSamples = 48*48*64

rain = jnp.zeros((48, 48)).at[10:14, 10:14].set(1.0)

def field(st):
    return soil.transport_fluvial(
        st.layers, rain, st.discharge, st.mass, st.momentum,
        st.albedo_surface, scale, p)[0]

def mc(st, seed):
    return soil.transport_fluvial(
        st.layers, rain, st.discharge, st.mass, st.momentum,
        st.albedo_surface, scale, p, method="particles",
        key=jax.random.PRNGKey(seed))[0]

# warm the coupled state a few steps with full rain so the terrain has
# structure, then probe the patch source on the warmed state
pw = soil.param_t(); pw.maxage = 64; pw.transportIterations = 62; pw.timeStep = 500.0
st = soil.erode(state, scale, pw, steps=6)

F = np.asarray(field(st))
Ms = [np.asarray(mc(st, s)) for s in range(24)]
M = np.mean(Ms, axis=0)
M2 = np.mean(Ms[:12], axis=0); M3 = np.mean(Ms[12:], axis=0)
def corr(a, b):
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
print(json.dumps({
    "field_vs_mc_corr": round(corr(F, M), 4),
    "mc_floor_corr": round(corr(M2, M3), 4),
    "field_total": float(F.sum()), "mc_total": float(M.sum()),
}))
