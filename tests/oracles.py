"""Pure-numpy oracles implementing the reference semantics cell-by-cell.

These are deliberately written in the reference's sequential style (loops
over cells / donor recursion) so the vectorized JAX ops are tested against
an independent formulation. Citations refer to /root/reference.
"""

import numpy as np

from soillib_tpu.core.grid import D4_SHIFTS, D8_SHIFTS

D4 = [(-1, 0), (0, -1), (0, 1), (1, 0)]
D8 = D4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]


def shifts(edge):
    return D4 if edge == 0 else D8


def steepest_oracle(h, edge):
    """graph.cu:28-70."""
    W, H = h.shape
    out = np.full((W, H), -1, np.int32)
    for x in range(W):
        for y in range(H):
            smax, nxt = 0.0, -1
            for dx, dy in shifts(edge):
                nx, ny = x + dx, y + dy
                if nx < 0 or ny < 0 or nx >= W or ny >= H:
                    continue
                s = (h[x, y] - h[nx, ny]) / np.sqrt(dx * dx + dy * dy)
                if s > smax:
                    smax, nxt = s, nx * H + ny
            out[x, y] = nxt
    return out


def direction_oracle(h, edge):
    """graph.cu:202-243."""
    W, H = h.shape
    out = np.full((W, H), -1, np.int32)
    for x in range(W):
        for y in range(H):
            smax, nxt = 0.0, -1
            for k, (dx, dy) in enumerate(shifts(edge)):
                nx, ny = x + dx, y + dy
                if nx < 0 or ny < 0 or nx >= W or ny >= H:
                    continue
                s = (h[x, y] - h[nx, ny]) / np.sqrt(dx * dx + dy * dy)
                if s > smax:
                    smax, nxt = s, k
            out[x, y] = nxt
    return out


def accumulate_oracle(graph, value, decay=None, edge=1):
    """Sequential upstream accumulation: push each cell's subtree total
    downstream by recursion (equivalent to graph.cu rake-compress result).

    A[j] = value[j] + sum_{i: recv[i]=j} w_i * A[i],
    w_i = decay[i] (or 1). The ^1.414 exponent follows the reference's
    my_decay-after-compaction semantics (graph.cu:351-420): each receiving
    cell's donors are ordered by the donor's direction slot; the exponent
    applies only to donors in compacted positions >= 4 (so a cell with
    <= 4 donors never applies it), and never for D4.
    """
    W, H = graph.shape
    g = graph.reshape(-1)
    v = value.reshape(-1).astype(np.float64)
    N = W * H

    shifts = D8_SHIFTS if edge == 1 else D4_SHIFTS

    def slot_of(i, j):
        dx = j // H - i // H
        dy = j % H - i % H
        for k, (sx, sy) in enumerate(shifts):
            if dx == sx and dy == sy:
                return k
        raise AssertionError("receiver is not a neighbor")

    # Donor lists per receiver, ordered by donor slot (the __donor write
    # order), then compacted (__count) before my_decay applies.
    donors = {}
    for i in range(N):
        j = g[i]
        if j < 0 or j == i:
            continue
        donors.setdefault(j, []).append((slot_of(i, j), i))

    w = np.ones(N)
    if decay is not None:
        d = decay.reshape(-1).astype(np.float64)
        for i in range(N):
            j = g[i]
            if j < 0 or j == i:
                continue
            w[i] = d[i]
        if edge == 1:
            for j, lst in donors.items():
                lst.sort()
                for pos, (_, i) in enumerate(lst):
                    if pos >= 4:
                        w[i] = d[i] ** 1.414

    # Topological push: process in order of decreasing upstream depth via
    # repeated relaxation over reverse topological order (DAG).
    indeg = np.zeros(N, np.int64)
    for i in range(N):
        j = g[i]
        if j >= 0 and j != i:
            indeg[j] += 1
    A = v.copy()
    stack = [i for i in range(N) if indeg[i] == 0]
    while stack:
        i = stack.pop()
        j = g[i]
        if j >= 0 and j != i:
            A[j] += w[i] * A[i]
            indeg[j] -= 1
            if indeg[j] == 0:
                stack.append(j)
    return A.reshape(W, H)


def glocal_oracle(h, scale, exit_slope):
    """__glocal Godunov gradient (erosion_map.cu:107-159). h is merged
    dimensionless height; returns (W, H, 2)."""
    W, H = h.shape
    sx, sy, sz = scale
    out = np.zeros((W, H, 2), np.float64)
    for x in range(W):
        for y in range(H):
            hc = h[x, y]

            def nb(dx, dy):
                nx, ny = x + dx, y + dy
                if nx < 0 or ny < 0 or nx >= W or ny >= H:
                    return np.nan
                return h[nx, ny]

            gxn = (hc - nb(-1, 0)) * sz / sx
            gxn = exit_slope if np.isnan(gxn) else max(gxn, 0.0)
            gyn = (hc - nb(0, -1)) * sz / sy
            gyn = exit_slope if np.isnan(gyn) else max(gyn, 0.0)
            gxp = (nb(1, 0) - hc) * sz / sx
            gxp = -exit_slope if np.isnan(gxp) else min(gxp, 0.0)
            gyp = (nb(0, 1) - hc) * sz / sy
            gyp = -exit_slope if np.isnan(gyp) else min(gyp, 0.0)

            gx = 0.0
            if abs(gxn) > abs(gx):
                gx = gxn
            if abs(gxp) > abs(gx):
                gx = gxp
            gy = 0.0
            if abs(gyn) > abs(gy):
                gy = gyn
            if abs(gyp) > abs(gy):
                gy = gyp
            out[x, y] = (gx, gy)
    return out


def creep_oracle(layers, scale, crit_slope):
    """__mass_creep (erosion.cu:633-710): returns the sediment delta."""
    W, H, _ = layers.shape
    sx, sy, sz = scale
    out = np.zeros((W, H), np.float64)

    def lay(x, y):
        xc = min(max(x, 0), W - 1)
        yc = min(max(y, 0), H - 1)
        if 0 <= x < W and 0 <= y < H:
            return layers[x, y]
        return None

    def transfer(lb, lt, dx):
        hb = (lb[0] + lb[1]) * sz
        ht = (lt[0] + lt[1]) * sz
        tmax = 0.5 * ((ht - hb) - crit_slope * dx)
        return max(0.0, min(lt[1] * sz, tmax))

    for x in range(W):
        for y in range(H):
            l00 = layers[x, y]
            h00 = (l00[0] + l00[1]) * sz
            t = 0.0
            for (dx, dy, s) in [(1, 0, sx), (-1, 0, sx), (0, 1, sy), (0, -1, sy)]:
                ln = lay(x + dx, y + dy)
                ln = l00 if ln is None else ln
                hn = (ln[0] + ln[1]) * sz
                if hn > h00:
                    t += transfer(l00, ln, s)
                else:
                    t -= transfer(ln, l00, s)
            out[x, y] = 0.25 * t / sz
    return out


def gaussian_blur_oracle(v, sigma):
    """filter.cu:24-56: ±16 taps, clamp-to-edge, unrenormalized kernel."""
    import math

    W, H = v.shape[:2]
    Z = math.sqrt(2 * math.pi) * sigma
    k = np.array([math.exp(-0.5 * (i / sigma) ** 2) / Z for i in range(-16, 17)])
    tmp = np.zeros_like(v, dtype=np.float64)
    for x in range(W):
        for y in range(H):
            acc = 0.0
            for i, kv in zip(range(-16, 17), k):
                acc += kv * v[min(max(x + i, 0), W - 1), y]
            tmp[x, y] = acc
    out = np.zeros_like(tmp)
    for x in range(W):
        for y in range(H):
            acc = 0.0
            for i, kv in zip(range(-16, 17), k):
                acc += kv * tmp[x, min(max(y + i, 0), H - 1)]
            out[x, y] = acc
    return out
