"""Cross-block particle migration: the MC estimators under shard_map.

The reference's Monte-Carlo solvers are single-GPU (SURVEY.md §2.10);
the field solve is this framework's scale-out formulation. This module
removes the remaining limitation — distributional MC studies were
single-device-only — by running the particle estimators block-
decomposed with ICI particle migration:

* Births are drawn GLOBALLY: every block evaluates the identical
  threefry draws (the key is replicated), then keeps the particles that
  fall inside its rectangle via masked compaction.  The particle SET —
  positions, per-particle sources — is therefore bit-identical to the
  single-device estimator's for any mesh shape, and a 1×1 mesh
  reproduces `_solve_particles` BITWISE.  Multi-block runs agree
  statistically but not per-cell-bitwise: a particle's deposit cell is
  floor(pos), discontinuous in position, so the 1-ulp cross-program
  reassociation freedom XLA has (fma/fusion differ between the padded
  block program and the global one) occasionally flips a near-threshold
  crossing and displaces that particle's remaining trajectory — the
  same chaos class the multi-step sharded erosion tests guard with
  integral metrics (tests/test_parallel.py).  Measured at 20k
  particles, 2×4 mesh: corr 0.9998, total-mass rel 6e-6, rel_mean
  0.3% vs single-device; the MC seed-to-seed band is far wider.
* A particle moves at most sqrt(2) cells per round (DDA stepsize,
  path.cu:104-139), so migration only ever targets the 4 neighbors;
  corners resolve in two axis hops exactly like the halo exchange
  (parallel/halo.py). Per round and direction, migrating records are
  compacted into a fixed-capacity buffer, `lax.ppermute`d along the
  mesh axis, and merged into the receiver's free (dead) slots.
  Capacity/slot overflow kills the particle and counts it — the solver
  returns the psum'd drop count so callers can assert 0 (tests do) or
  re-run with more slack.
* Particles crossing the GLOBAL edge are sent to no one (non-wrapping
  permutation) — they die exactly where the single-device estimator's
  in-bounds check kills them, before depositing.

All buffers are static-shaped: local slot arrays hold
ceil(count/nblocks * slack) records; compaction is a stable argsort
(masked-first) — O(M log M) VPU work per round, the price of
atomics-free, shape-static migration on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from soillib_tpu.parallel.halo import ShardHalo


def _take(rec, mask, cap):
    """Compact up to `cap` masked records into a (cap, ...) buffer.

    Returns (buffer, valid, n_overflow): stable masked-first ordering,
    `valid[i]` marks real records, overflow = masked records beyond
    capacity."""
    order = jnp.argsort(~mask)  # mask=True rows first (stable)
    take = order[:cap]
    buf = jax.tree.map(lambda a: a[take], rec)
    valid = mask[take]
    n_over = jnp.sum(mask) - jnp.sum(valid)
    return buf, valid, n_over


def _merge(rec, alive, buf, valid):
    """Scatter valid buffer records into dead slots of the local arrays.

    Returns (rec, alive, n_dropped) — dropped = arrivals with no free
    slot."""
    cap = valid.shape[0]
    order = jnp.argsort(alive)  # dead slots first (stable)
    slots = order[:cap]
    ok = valid & ~alive[slots]

    def put(a, b):
        okb = ok.reshape(ok.shape + (1,) * (b.ndim - 1))
        return a.at[slots].set(jnp.where(okb, b, a[slots]))

    rec = jax.tree.map(put, rec, buf)
    alive = alive.at[slots].set(ok | alive[slots])
    return rec, alive, jnp.sum(valid) - jnp.sum(ok)


def _migrate_axis(rec, alive, coord, lo, hi, axis_name, n_blocks, cap):
    """Move records whose `coord` left [lo, hi) to the -/+ neighbor
    along `axis_name`. Non-wrapping: global-edge leavers die (the
    single-device in-bounds kill). Returns (rec, alive, dropped)."""
    dropped = jnp.zeros((), jnp.int32)
    for sign in (+1, -1):
        m = alive & ((coord >= hi) if sign > 0 else (coord < lo))
        buf, valid, over = _take(rec, m, cap)
        alive = alive & ~m  # leavers (incl. overflow) vacate this block
        dropped = dropped + over.astype(jnp.int32)
        perm = [(i, i + sign) for i in range(n_blocks)
                if 0 <= i + sign < n_blocks]
        if perm:
            buf = jax.tree.map(
                lambda a: lax.ppermute(a, axis_name, perm), buf
            )
            valid = lax.ppermute(valid, axis_name, perm)
            rec, alive, d2 = _merge(rec, alive, buf, valid)
            dropped = dropped + d2.astype(jnp.int32)
    return rec, alive, dropped


def _bilinear_global(flow_pad, pos, x0, y0, W, H):
    """`ops.transport.bilinear_gather` semantics (global far-edge clamp,
    sample.hpp:155-186) evaluated on a 1-ring-padded LOCAL block.
    `pos` must lie inside the local block (post-migration)."""
    x, y = pos[:, 0], pos[:, 1]
    gx0 = jnp.floor(x).astype(jnp.int32)
    gy0 = jnp.floor(y).astype(jnp.int32)
    wx = x - gx0
    wy = y - gy0
    wx = jnp.where(x + 1.0 > W - 1.0, 0.0, wx)
    wy = jnp.where(y + 1.0 > H - 1.0, 0.0, wy)
    bw = flow_pad.shape[0] - 2
    bh = flow_pad.shape[1] - 2
    lx0 = jnp.clip(gx0 - x0 + 1, 0, bw + 1)
    ly0 = jnp.clip(gy0 - y0 + 1, 0, bh + 1)
    lx1 = jnp.clip(jnp.clip(gx0 + 1, 0, W - 1) - x0 + 1, 0, bw + 1)
    ly1 = jnp.clip(jnp.clip(gy0 + 1, 0, H - 1) - y0 + 1, 0, bh + 1)
    wxe, wye = wx[:, None], wy[:, None]
    v = (
        flow_pad[lx0, ly0] * (1 - wxe) * (1 - wye)
        + flow_pad[lx0, ly1] * (1 - wxe) * wye
        + flow_pad[lx1, ly0] * wxe * (1 - wye)
        + flow_pad[lx1, ly1] * wxe * wye
    )
    # The reference's valid domain is [0, dim-1] — the last PARTIAL cell
    # is out of bounds (bilinear_gather returns NaN there; the particle
    # solver maps that to velocity 0, killing the particle).
    oob = (x < 0) | (y < 0) | (x > W - 1.0) | (y > H - 1.0)
    return jnp.where(oob[:, None], 0.0, v)


def solve_particles_sharded(flow, source, decay, scale, count, key, mesh,
                            maxstep=None, slack=1.5):
    """Block-decomposed `solve_uniform(method="particles")` with ICI
    particle migration — the faithful MC estimator of path.cu:52-139 at
    mesh scale. Returns ((W, H[, K]) flux, dropped count).

    The estimate equals the single-device `_solve_particles` with the
    same key — bitwise on a 1×1 mesh, statistically (corr ≥ 0.999,
    conserved total mass) on real meshes; see the module docstring for
    why per-cell bitwise multi-block parity is impossible.  `dropped` >
    0 means a capacity overflow somewhere — re-run with more `slack`
    (the parity test asserts 0)."""
    from soillib_tpu.ops.transport import stepsize

    W, H = flow.shape[0], flow.shape[1]
    squeeze = source.ndim == 2
    src3 = source[..., None] if squeeze else source
    K = src3.shape[2]
    px, py = mesh.devices.shape
    ax, ay = mesh.axis_names
    n_blocks = px * py
    bw, bh = W // px, H // py
    assert bw * px == W and bh * py == H, "grid must divide the mesh"
    N = int(count)
    M = int(math.ceil(N / n_blocks * slack)) + 64
    cap = max(64, int(4 * M / min(bw, bh)) + 16)
    A = float(scale[0]) * float(scale[1])
    L = math.sqrt(float(scale[0]) ** 2 + float(scale[1]) ** 2)
    Pn = 1.0 / (A * W * H)
    eps = 1e-16
    steps = int(maxstep if maxstep is not None else W + H)
    halo = ShardHalo(mesh.devices.shape, mesh.axis_names)

    def local(flow_b, src_b, dec_b, key):
        x0, y0, _, _ = halo.global_offsets((bw, bh))
        # Identical global birth draws on every block (replicated key).
        kx, ky = jax.random.split(key)
        gpos = jnp.stack(
            [jax.random.uniform(kx, (N,), jnp.float32) * W,
             jax.random.uniform(ky, (N,), jnp.float32) * H], axis=-1)
        mine = ((gpos[:, 0] >= x0) & (gpos[:, 0] < x0 + bw)
                & (gpos[:, 1] >= y0) & (gpos[:, 1] < y0 + bh))
        (pos,), taken, over0 = _take((gpos,), mine, M)
        if pos.shape[0] < M:  # argsort take caps at N — pad dead slots
            padn = M - pos.shape[0]
            pos = jnp.pad(pos, ((0, padn), (0, 0)))
            taken = jnp.pad(taken, (0, padn))

        src_flat = src_b.reshape(bw * bh, K)
        dec_flat = dec_b.reshape(bw * bh)
        flow_pad = halo.pad(flow_b, 0.0, 1)

        def lind(p):
            pc = jnp.clip(p, jnp.array([x0, y0], jnp.float32),
                          jnp.array([x0 + bw - 1e-3, y0 + bh - 1e-3]))
            return ((pc[:, 0].astype(jnp.int32) - x0) * bh
                    + (pc[:, 1].astype(jnp.int32) - y0))

        ind = lind(pos)
        S = src_flat[ind] / Pn
        alive = taken & (jnp.linalg.norm(S, axis=-1) >= eps)
        # Global cell id survives migration; -1 forces the first
        # in-new-cell deposit after arrival exactly like nind != ind.
        gind = jnp.where(
            alive,
            pos[:, 0].astype(jnp.int32) * H + pos[:, 1].astype(jnp.int32),
            -1,
        )

        flux0 = jnp.zeros((bw * bh, K), jnp.float32)
        att0 = jnp.ones((M,), jnp.float32)

        def body(_, carry):
            flux, rec, alive, dropped = carry

            # -- migrate first: everything below is block-local.
            rec, alive, d1 = _migrate_axis(
                rec, alive, rec["pos"][:, 0], x0, x0 + bw, ax, px, cap)
            rec, alive, d2 = _migrate_axis(
                rec, alive, rec["pos"][:, 1], y0, y0 + bh, ay, py, cap)
            pos, att, S_, gind = rec["pos"], rec["att"], rec["S"], rec["g"]
            dropped = dropped + d1 + d2

            x, y = pos[:, 0], pos[:, 1]
            inb = (x >= 0) & (y >= 0) & (x < W) & (y < H)
            alive = alive & inb & (eps < jnp.abs(att))

            pc = jnp.clip(pos, 0.0, jnp.array([W - 1e-3, H - 1e-3]))
            ngind = (pc[:, 0].astype(jnp.int32) * H
                     + pc[:, 1].astype(jnp.int32))
            entered = alive & (ngind != gind)
            gind = jnp.where(entered, ngind, gind)
            li = lind(pos)
            dep = jnp.where(entered[:, None], S_ * att[:, None], 0.0)
            flux = flux.at[li].add(dep)

            v = _bilinear_global(flow_pad, pos, x0, y0, W, H)
            v = jnp.where(jnp.isnan(v), 0.0, v)
            v_len = jnp.linalg.norm(v, axis=-1)
            alive = alive & (v_len >= eps)
            v_n = v / jnp.maximum(v_len, 1e-30)[:, None]
            stp = stepsize(pos, v_n)
            new_pos = pos + stp[:, None] * v_n
            dlam = stp * L / jnp.maximum(v_len, 1e-30)
            new_att = att * jnp.exp(-dlam * dec_flat[li])

            rec = {
                "pos": jnp.where(alive[:, None], new_pos, pos),
                "att": jnp.where(alive, new_att, att),
                "S": S_,
                "g": gind,
            }
            return flux, rec, alive, dropped

        rec0 = {"pos": pos, "att": att0, "S": S, "g": gind}
        flux, _, _, dropped = lax.fori_loop(
            0, max(steps - 1, 0), body,
            (flux0, rec0, alive, over0.astype(jnp.int32)),
        )
        dropped = lax.psum(lax.psum(dropped, ax), ay)
        return flux.reshape(bw, bh, K), dropped

    spec3 = P(ax, ay, None)
    spec2 = P(ax, ay)
    flux, dropped = shard_map(
        local, mesh=mesh,
        in_specs=(spec3, spec3, spec2, P()),
        out_specs=(spec3, P()),
        check_vma=False,
    )(flow, src3, decay, key)
    G = flux / float(count)
    return (G[..., 0] if squeeze else G), dropped
