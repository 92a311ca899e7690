from soillib_tpu.models.params import ErosionParams, param_t
from soillib_tpu.models.erosion import (
    godunov_gradient,
    transport_fluvial,
    transport_debris,
    mass_transfer,
    mass_creep,
    layer_merge,
    albedo_stratum,
    albedo_layer,
    albedo_discharge,
)
from soillib_tpu.models.simulation import ErosionState, ErosionSim, erode, make_erode_fn
from soillib_tpu.models.multiscale import level_scale, resize_state, run_cascade
