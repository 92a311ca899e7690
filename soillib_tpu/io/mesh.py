"""Terrain triangulation -> PLY export (reference: io/mesh.hpp:33-135).

NaN-skipping vertex insertion with index remap, two triangles per quad,
min/max height normalization, `center()`, ascii (`write`) and binary
(`write_binary`) output. Fully vectorized with numpy (the reference loops
per-quad on the CPU).
"""

from __future__ import annotations

import struct

import numpy as np


def _native_triangulate(h, scale):
    """C++ triangulation (soillib_tpu.native); None falls back to numpy."""
    try:
        from soillib_tpu import native
    except ImportError:
        return None
    return native.triangulate(np.asarray(h, np.float32), scale)


def _native_ply(path, vertices, faces, binary):
    try:
        from soillib_tpu import native
    except ImportError:
        return False
    return native.ply_write(path, vertices, faces, binary)


class mesh:
    def __init__(self, tensor=None, scale=(1.0, 1.0, 1.0)):
        self.vertices = np.zeros((0, 3), np.float32)
        self.faces = np.zeros((0, 3), np.int32)
        if tensor is not None:
            self._triangulate(np.asarray(tensor, np.float32), scale)

    def _triangulate(self, h: np.ndarray, scale):
        out = _native_triangulate(h, scale)
        if out is not None:
            self.vertices, self.faces = out
            return
        W, H = h.shape
        sx, sy, sz = float(scale[0]), float(scale[1]), float(scale[2])

        # Height normalization to [0, 1] (io/mesh.hpp min/max normalize).
        hmin = np.nanmin(h)
        hmax = np.nanmax(h)
        hn = (h - hmin) / (hmax - hmin) if hmax > hmin else np.zeros_like(h)

        valid = ~np.isnan(h)
        # Vertex index remap: -1 where NaN.
        remap = np.full(W * H, -1, np.int64)
        flat_valid = valid.reshape(-1)
        remap[flat_valid] = np.arange(flat_valid.sum())

        xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
        verts = np.stack(
            [xs.reshape(-1) * sx, ys.reshape(-1) * sy, hn.reshape(-1) * sz], axis=-1
        )[flat_valid].astype(np.float32)

        # Two triangles per quad where all four corners are valid.
        i00 = (xs[:-1, :-1] * H + ys[:-1, :-1]).reshape(-1)
        i10 = i00 + H
        i01 = i00 + 1
        i11 = i00 + H + 1
        q = (
            flat_valid[i00] & flat_valid[i10] & flat_valid[i01] & flat_valid[i11]
        )
        t1 = np.stack([remap[i00], remap[i10], remap[i11]], axis=-1)[q]
        t2 = np.stack([remap[i00], remap[i11], remap[i01]], axis=-1)[q]
        self.vertices = verts
        self.faces = np.concatenate([t1, t2], axis=0).astype(np.int32)

    def center(self):
        """Translate vertices so the bounding box is centered at the origin."""
        if len(self.vertices):
            mid = 0.5 * (self.vertices.min(0) + self.vertices.max(0))
            self.vertices = self.vertices - mid
        return self

    def write(self, filename: str) -> bool:
        """ASCII PLY."""
        with open(filename, "w") as f:
            f.write(self._header(ascii=True))
            for v in self.vertices:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for t in self.faces:
                f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
        return True

    def write_binary(self, filename: str) -> bool:
        """Binary little-endian PLY."""
        if _native_ply(filename, self.vertices, self.faces, binary=True):
            return True
        with open(filename, "wb") as f:
            f.write(self._header(ascii=False).encode("ascii"))
            f.write(self.vertices.astype("<f4").tobytes())
            counts = np.full((len(self.faces), 1), 3, np.uint8)
            body = bytearray()
            for c, t in zip(counts, self.faces):
                body += struct.pack("<B3i", 3, int(t[0]), int(t[1]), int(t[2]))
            f.write(bytes(body))
        return True

    def _header(self, ascii: bool) -> str:
        fmt = "ascii 1.0" if ascii else "binary_little_endian 1.0"
        return (
            "ply\n"
            f"format {fmt}\n"
            f"element vertex {len(self.vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(self.faces)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
