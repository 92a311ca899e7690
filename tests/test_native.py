"""C++ native runtime vs the pure-Python implementations."""

import struct

import numpy as np
import pytest

from soillib_tpu import native
from soillib_tpu.io import tiffcore


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF-variant LZW encoder (MSB-first, early change) — test
    oracle only."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def put(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w = w + c
            continue
        put(table[w], width)
        table[w + c] = nxt
        nxt += 1
        # The encoder runs one table entry ahead of the decoder, so its
        # early change fires at a full power of two.
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = c
    if w:
        put(table[w], width)
    put(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lzw_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    # Compressible-ish data: small alphabet plus runs.
    raw = rng.integers(0, 9, size=20000, dtype=np.uint8).tobytes()
    raw += b"\x00" * 5000 + raw[:3000]
    enc = _lzw_encode(raw)
    assert tiffcore._unpack_lzw(enc) == raw
    assert native.lzw_decode(enc, len(raw)) == raw


def test_packbits_native_matches_python():
    raw = b"\x01" * 200 + bytes(range(64)) + b"\xff" * 300
    # encode: runs + literals (simple encoder)
    enc = bytearray()
    i = 0
    while i < len(raw):
        run = 1
        while i + run < len(raw) and raw[i + run] == raw[i] and run < 127:
            run += 1
        if run >= 2:
            enc += bytes([257 - run, raw[i]])
            i += run
        else:
            j = i
            while j < len(raw) and (
                j + 1 >= len(raw) or raw[j + 1] != raw[j]
            ) and j - i < 127:
                j += 1
            enc += bytes([j - i - 1]) + raw[i:j]
            i = j
    enc = bytes(enc)
    assert tiffcore._unpack_packbits(enc, len(raw)) == raw
    assert native.packbits_decode(enc, len(raw)) == raw


def test_triangulate_matches_numpy():
    rng = np.random.default_rng(3)
    h = rng.normal(size=(20, 24)).astype(np.float32)
    h[3, 4] = np.nan
    h[10:12, 7] = np.nan
    got = native.triangulate(h, (0.5, 0.5, 2.0))
    assert got is not None
    verts_n, faces_n = got

    import importlib
    # the io package rebinds attribute `mesh` to the class; fetch the module
    mesh_mod = importlib.import_module("soillib_tpu.io.mesh")
    orig = mesh_mod._native_triangulate
    mesh_mod._native_triangulate = lambda *a: None
    try:
        m = mesh_mod.mesh(h, (0.5, 0.5, 2.0))
    finally:
        mesh_mod._native_triangulate = orig

    np.testing.assert_allclose(verts_n, m.vertices, rtol=1e-6)
    assert len(faces_n) == len(m.faces)
    # Same triangle *set* (native interleaves the two quad triangles like
    # the reference io/mesh.hpp; numpy batches them).
    s1 = {tuple(t) for t in faces_n.tolist()}
    s2 = {tuple(t) for t in m.faces.tolist()}
    assert s1 == s2


def test_ply_write_binary_native(tmp_path):
    h = np.linspace(0, 1, 12 * 10, dtype=np.float32).reshape(12, 10)
    from soillib_tpu.io.mesh import mesh
    m = mesh(h)
    p = str(tmp_path / "m.ply")
    assert m.write_binary(p)
    blob = open(p, "rb").read()
    header, body = blob.split(b"end_header\n", 1)
    assert b"element vertex 120" in header
    assert b"element face 198" in header
    nbytes = 120 * 12 + 198 * 13
    assert len(body) == nbytes


def test_fbm_native_matches_jax():
    """Same lattice hash + gradients; float rounding may flip the simplex
    corner choice on a handful of cells, so the match is statistical."""
    from soillib_tpu.ops.noise import noise, noise_t
    p = noise_t(octaves=4, ext=(64.0, 64.0), compat=False)
    want = np.asarray(noise((48, 40), p))
    got = native.fbm2((48, 40), p.ext, p.frequency, p.octaves, p.gain,
                      p.lacunarity, p.seed)
    close = np.abs(got - want) < 1e-4
    assert close.mean() > 0.98, f"only {close.mean():.3f} of cells match"
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999
    assert np.abs(got).max() <= 1.0
