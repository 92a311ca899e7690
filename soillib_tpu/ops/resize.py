"""Bilinear rescale and world-space blit.

These cover the legacy silt surface used by the multiscale/merge examples —
`soil.resize(dst, src, newres, oldres)` (erosion_gpu_multiscale.py:112-137)
and `soil.copy(dst, src, gmin, gmax, gscale, wmin, wmax, wscale, pscale)`
(tiff_merge.py:67) — in functional JAX form (they return new arrays).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_sample(src, xs, ys, fill=jnp.nan):
    """Bilinear sample of (W, H[, C]) `src` at float coords (xs, ys) (arrays
    of identical shape); clamps to edge, `fill` where fully out of range."""
    W, H = src.shape[0], src.shape[1]
    oob = (xs < -0.5) | (ys < -0.5) | (xs > W - 0.5) | (ys > H - 0.5)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    if src.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
        oobm = oob[..., None]
    else:
        oobm = oob
    v00 = src[x0, y0]
    v01 = src[x0, y1]
    v10 = src[x1, y0]
    v11 = src[x1, y1]
    val = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * (1 - wx) * wy
        + v10 * wx * (1 - wy)
        + v11 * wx * wy
    )
    return jnp.where(oobm, fill, val)


def resize(src, newres):
    """Bilinear rescale of a (W, H[, C]) field to (newres[0], newres[1][, C]).

    Uses half-pixel-center mapping: dst pixel i samples the source at
    (i + 0.5) * old/new - 0.5.
    """
    src = jnp.asarray(src)
    nW, nH = int(newres[0]), int(newres[1])
    W, H = src.shape[0], src.shape[1]
    xs = (jnp.arange(nW, dtype=jnp.float32) + 0.5) * (W / nW) - 0.5
    ys = (jnp.arange(nH, dtype=jnp.float32) + 0.5) * (H / nH) - 0.5
    xg = jnp.broadcast_to(xs[:, None], (nW, nH))
    yg = jnp.broadcast_to(ys[None, :], (nW, nH))
    x0 = jnp.clip(xg, 0.0, W - 1.0)
    y0 = jnp.clip(yg, 0.0, H - 1.0)
    return _bilinear_sample(src, x0, y0)


def copy(dst, src, gmin, gmax, gscale, wmin, wmax, wscale, pscale):
    """World-space blit: paint `src` (world extent [gmin, gmax], pixel scale
    gscale) into `dst` (world extent [wmin, wmax], pixel scale wscale,
    resolution additionally scaled by pscale). Cells of dst outside src's
    extent are left untouched. Returns the updated dst.

    This reconstructs the legacy silt `soil.copy` used by tiff_merge.py:67.
    """
    dst = jnp.asarray(dst)
    src = jnp.asarray(src)
    W, H = dst.shape[0], dst.shape[1]

    # World position of each dst pixel center.
    xs = wmin[0] + (jnp.arange(W, dtype=jnp.float32) + 0.5) * (wscale[0] / pscale)
    ys = wmin[1] + (jnp.arange(H, dtype=jnp.float32) + 0.5) * (wscale[1] / pscale)
    xg = jnp.broadcast_to(xs[:, None], (W, H))
    yg = jnp.broadcast_to(ys[None, :], (W, H))

    # Source pixel coordinates for those world positions.
    sx = (xg - gmin[0]) / gscale[0] - 0.5
    sy = (yg - gmin[1]) / gscale[1] - 0.5
    sampled = _bilinear_sample(src, sx, sy, fill=jnp.nan)

    inside = (
        (xg >= gmin[0]) & (xg <= gmax[0]) & (yg >= gmin[1]) & (yg <= gmax[1])
        & ~jnp.isnan(sampled)
    )
    return jnp.where(inside, sampled, dst)
