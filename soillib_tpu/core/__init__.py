from soillib_tpu.core.grid import D4, D8, D4_SHIFTS, D8_SHIFTS, Shape, flatten, unflatten, oob
from soillib_tpu.core.timer import timer, ns, us, ms, s
