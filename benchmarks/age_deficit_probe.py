"""Per-age deposit totals: field cohort vs MC, single-origin patch.
Where does the ~10% single-origin flux deficit arise?"""
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
from soillib_tpu.models import erosion as ero
from soillib_tpu.ops import cohort as co

terr = parity.make_terrains(48, ("noise",))["noise"]
state = soil.ErosionState.zeros((48, 48), height=terr)
scale = (0.078, 0.078, 4.0)
rain = jnp.zeros((48, 48)).at[10:14, 10:14].set(1.0)
pw = soil.param_t(); pw.maxage = 64; pw.transportIterations = 62; pw.timeStep = 500.0
st = soil.erode(state, scale, pw, steps=6)
p = soil.param_t(); p.maxage = 128; p.timeStep = 500.0

# --- field: per-round water deposit totals via the reference loop
t = ero._fluvial_terms(st.layers, rain, st.discharge, st.momentum,
                       st.albedo_surface, scale, p)
speed, Llen, A = t["speed"], t["Llen"], t["A"]
accel = t["E_v"] / A + t["force"][:, None, None]
rules = ero.make_fluvial_rules(p, Llen)
W, H = st.discharge.shape
bd = ero._birth_density(W, H)
carried0 = [bd * t["E_w"], bd * t["E_m"], bd * t["E_v"][0], bd * t["E_v"][1],
            bd * t["E_a"][0], bd * t["E_a"][1], bd * t["E_a"][2]]
fD = p.frictionFactor / 8.0
rate_v = jnp.clip(-Llen * 0.125 * fD / (ero._EPS + st.discharge), -ero._RATE_CLIP, 0.0)
aux = (accel[0], accel[1], jnp.ones_like(st.discharge), rate_v)
stc = co.as_stack(ero._build_cohort_state(bd, speed, carried0, None))
auxs = co.as_stack(aux)
C = co.n_deposits(stc.shape[0])
G = jnp.zeros((C, W, H))
field_per_round = []
sA = stc
for r in range(126):
    G0 = G
    sA, G = co.cohort_round(sA, G, auxs, rules, Llen, co.shift_push)
    field_per_round.append(float((G[0] - G0[0]).sum()))
# live weight trace
print("field cumulative W-flux:", round(float(G[0].sum()), 3))

# --- MC: per-age deposit totals (instrumented copy of the loop idea:
# run MC with different maxage values and difference the totals)
def mc_total(maxage, seed):
    pm = soil.param_t(); pm.maxage = maxage; pm.timeStep = 500.0
    pm.nSamples = 48*48*64
    F = soil.transport_fluvial(
        st.layers, rain, st.discharge, st.mass, st.momentum,
        st.albedo_surface, scale, pm, method="particles",
        key=jax.random.PRNGKey(seed))[0]
    # undo normalize: G_w = (A*R*rain + flux)/norm -> flux totals need
    # norm... compare the normalized outputs' totals instead (same
    # normalize for both paths).
    return float(np.asarray(F).sum())

ages = [4, 8, 16, 32, 64, 128]
mc_tot = {a: np.mean([mc_total(a, s) for s in range(6)]) for a in ages}
print("MC totals by maxage:", {a: round(v, 2) for a, v in mc_tot.items()})
# field totals at matching deposit depths (maxage-2 rounds)
cum = np.cumsum(field_per_round)
# convert field flux to discharge-output totals like transport_fluvial:
norm = float(scale[1])
rain_term = float((A * p.rainfall * np.asarray(rain)).sum())
fld_tot = {a: (rain_term + cum[a - 2 - 1]) / norm for a in ages}
print("field totals by depth:", {a: round(v, 2) for a, v in fld_tot.items()})
print("ratio by depth:", {a: round(fld_tot[a] / mc_tot[a], 4) for a in ages})
