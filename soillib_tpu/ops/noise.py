"""Procedural fractal noise (reference: op/noise.hpp + vendored FastNoiseLite).

The reference samples FastNoiseLite OpenSimplex2 FBm on the CPU, one cell at
a time, at coordinates (x/ext.x, y/ext.y, seed) — the seed rides in as the
*third* noise coordinate (op/noise.hpp:37-39). Parameter defaults match
noise_param_t: frequency=1, octaves=8, gain=0.6, lacunarity=2, ext=(512,512)
(op/noise.hpp:29-34).

TPU-native re-design: a vectorized simplex-lattice gradient noise evaluated
for the whole grid in one fused jnp program (no per-cell loop, no vendored
2586-line library). Values are deterministic in the parameters, smooth,
isotropic, and in [-1, 1]; FBm octaves are amplitude-normalized the way
FastNoiseLite's fractal bounding does (sum of octave amplitudes == 1).
Bit-level parity with FastNoiseLite is *not* a goal (the reference itself
treats noise as an arbitrary procedural source).

The lattice hash is a counter-based integer mix (no permutation tables) so
the whole evaluation is branch-free vector code.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

_F3 = 1.0 / 3.0  # 3-D simplex skew factor
_G3 = 1.0 / 6.0  # 3-D simplex unskew factor

# 12 gradient directions: edge midpoints of a cube.
_GRAD3 = np.array(
    [
        [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
        [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
        [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
    ],
    dtype=np.float32,
)


def _hash3(i, j, k, seed):
    """Counter-based lattice hash -> uint32. Murmur-style avalanche mix."""
    h = (
        i.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
        + j.astype(jnp.uint32) * jnp.uint32(0xD8163841)
        + k.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
        + jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
    )
    h ^= h >> 15
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def _grad_dot(i, j, k, seed, dx, dy, dz):
    """dot(gradient(lattice point), displacement)."""
    g = _hash3(i, j, k, seed) % jnp.uint32(12)
    gv = jnp.asarray(_GRAD3)[g]
    return gv[..., 0] * dx + gv[..., 1] * dy + gv[..., 2] * dz


def simplex3(x, y, z, seed: int = 0):
    """Vectorized 3-D simplex noise in [-1, 1] (approx)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)

    s = (x + y + z) * _F3
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)
    k = jnp.floor(z + s).astype(jnp.int32)
    t = (i + j + k).astype(jnp.float32) * _G3
    x0 = x - (i.astype(jnp.float32) - t)
    y0 = y - (j.astype(jnp.float32) - t)
    z0 = z - (k.astype(jnp.float32) - t)

    # Rank the components to find the simplex traversal order.
    gx = (x0 >= y0).astype(jnp.int32) + (x0 >= z0).astype(jnp.int32)
    gy = (y0 > x0).astype(jnp.int32) + (y0 >= z0).astype(jnp.int32)
    gz = (z0 > x0).astype(jnp.int32) + (z0 > y0).astype(jnp.int32)
    i1 = (gx >= 2).astype(jnp.int32)
    j1 = (gy >= 2).astype(jnp.int32)
    k1 = (gz >= 2).astype(jnp.int32)
    i2 = (gx >= 1).astype(jnp.int32)
    j2 = (gy >= 1).astype(jnp.int32)
    k2 = (gz >= 1).astype(jnp.int32)

    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3

    def corner(dx, dy, dz, ci, cj, ck):
        tt = 0.6 - dx * dx - dy * dy - dz * dz
        tt = jnp.maximum(tt, 0.0)
        return (tt * tt) * (tt * tt) * _grad_dot(ci, cj, ck, seed, dx, dy, dz)

    n = (
        corner(x0, y0, z0, i, j, k)
        + corner(x1, y1, z1, i + i1, j + j1, k + k1)
        + corner(x2, y2, z2, i + i2, j + j2, k + k2)
        + corner(x3, y3, z3, i + 1, j + 1, k + 1)
    )
    return 32.0 * n


@dataclasses.dataclass
class noise_t:
    """Noise parameter set, field-compatible with noise_param_t
    (op/noise.hpp:14-40)."""

    frequency: float = 1.0
    octaves: int = 8
    gain: float = 0.6
    lacunarity: float = 2.0
    seed: float = 0.0
    ext: tuple = (512.0, 512.0)


def noise(shape, param: noise_t = None):
    """FBm fractal noise over a (W, H) grid.

    Samples at ((x/ext.x)*frequency*lacunarity^o, (y/ext.y)*..., seed) per
    octave, amplitudes gain^o normalized to sum to 1 (FastNoiseLite fractal
    bounding). Ref: op/noise.hpp:42-56.

    Args:
      shape: (W, H) or a Shape.
      param: noise_t.
    Returns:
      (W, H) float32 array.
    """
    if param is None:
        param = noise_t()
    W, H = int(shape[0]), int(shape[1])
    ext = param.ext
    x = (jnp.arange(W, dtype=jnp.float32) / jnp.float32(ext[0]))[:, None]
    y = (jnp.arange(H, dtype=jnp.float32) / jnp.float32(ext[1]))[None, :]
    x = jnp.broadcast_to(x, (W, H))
    y = jnp.broadcast_to(y, (W, H))
    z = jnp.float32(param.seed)

    total = jnp.zeros((W, H), dtype=jnp.float32)
    amp = 1.0
    bounding = 0.0
    freq = float(param.frequency)
    # Octave index is folded into the hash seed so octaves decorrelate.
    for o in range(int(param.octaves)):
        total = total + amp * simplex3(x * freq, y * freq, z * freq, seed=o * 1013 + 7)
        bounding += amp
        amp *= float(param.gain)
        freq *= float(param.lacunarity)
    return total / jnp.float32(bounding)
