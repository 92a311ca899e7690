from soillib_tpu.ops.stencil import gradient, negslope, laplacian, normal
from soillib_tpu.ops.filter import gaussian_blur
from soillib_tpu.ops.graph import (
    steepest,
    direction,
    random_weighted,
    slope,
    accumulate,
    accumulate_decay,
)
from soillib_tpu.ops.noise import noise, noise_t
from soillib_tpu.ops.resize import resize, copy
from soillib_tpu.ops.transport import solve_uniform
