"""I/O round-trip tests: TIFF codec, GeoTIFF tags, PLY, zip checkpoint."""

import os
import zlib

import numpy as np
import pytest

import soillib_tpu as soil
from soillib_tpu.io import tiffcore
from soillib_tpu.io.checkpoint import zip_load, zip_save


@pytest.fixture
def arr():
    rng = np.random.default_rng(5)
    return rng.random((19, 23)).astype(np.float32)


def test_tiff_roundtrip(tmp_path, arr):
    path = str(tmp_path / "a.tiff")
    t = soil.tiff(arr)
    t.write(path)
    t2 = soil.tiff(path)
    np.testing.assert_array_equal(t2.numpy(), arr)
    assert t2.width == 23 and t2.height == 19 and t2.bits == 32


def test_tiff_float64_roundtrip(tmp_path):
    path = str(tmp_path / "d.tiff")
    arr = np.random.default_rng(0).random((7, 9))  # float64
    soil.tiff(arr).write(path)
    got = soil.tiff(path).numpy()
    np.testing.assert_array_equal(got, arr)
    assert got.dtype == np.float64


def test_tiff_peek(tmp_path, arr):
    path = str(tmp_path / "a.tiff")
    soil.tiff(arr).write(path)
    t = soil.tiff()
    t.peek(path)
    assert t.width == 23 and t.height == 19
    assert t._array is None  # metadata only


def test_geotiff_meta_roundtrip(tmp_path, arr):
    path = str(tmp_path / "g.tiff")
    g = soil.geotiff(arr)
    g.meta.scale = [0.5, 0.25, 1.0]
    g.meta.coords = [0, 0, 0, 100.0, 200.0, 0]
    g.meta.gdal_nodata = "-9999"
    g.meta.gdal_metadata = "<GDALMetadata></GDALMetadata>"
    g.meta.geoasciiparams = "WGS 84|"
    g.meta.keydir = [1, 1, 0, 1, 1024, 0, 1, 2]
    g.meta.params = [6378137.0]
    g.write(path)

    g2 = soil.geotiff(path)
    assert g2.meta.scale == [0.5, 0.25, 1.0]
    assert g2.meta.coords == [0, 0, 0, 100.0, 200.0, 0]
    assert g2.meta.gdal_nodata == "-9999"
    assert g2.meta.gdal_metadata == "<GDALMetadata></GDALMetadata>"
    assert g2.meta.geoasciiparams == "WGS 84|"
    assert g2.meta.keydir == [1, 1, 0, 1, 1024, 0, 1, 2]
    assert g2.meta.params == [6378137.0]
    np.testing.assert_array_equal(g2.numpy(), arr)


def test_geotiff_matrix_roundtrip(tmp_path, arr):
    """Matrix-georeferenced GeoTIFFs (GeoTransMatrix 34264 and/or the
    Intergraph matrix 33920 INSTEAD of the tie-point/scale pair) keep
    their projection through read -> write -> read
    (io/geotiff.hpp:12-50, write-back :194-241)."""
    path = str(tmp_path / "m.tiff")
    g = soil.geotiff(arr)
    mat = [2.0, 0.0, 0.0, 100.0,
           0.0, -2.0, 0.0, 200.0,
           0.0, 0.0, 1.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    ig = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 5.0, 6.0]
    g.meta.matrix = mat
    g.meta.intergraph = ig
    g.write(path)

    g2 = soil.geotiff(path)
    assert g2.meta.matrix == mat
    assert g2.meta.intergraph == ig
    # Second cycle: the re-emit must be stable, not one-shot.
    path2 = str(tmp_path / "m2.tiff")
    g2.write(path2)
    g3 = soil.geotiff(path2)
    assert g3.meta.matrix == mat
    assert g3.meta.intergraph == ig


def test_geotiff_nodata_nan(tmp_path):
    path = str(tmp_path / "n.tiff")
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    arr[1, 1] = -9999.0
    g = soil.geotiff(arr)
    g.meta.gdal_nodata = "-9999"
    g.write(path)
    g2 = soil.geotiff(path)
    assert np.isnan(g2.numpy()[1, 1])
    g2.unsetnan()
    assert g2.numpy()[1, 1] == -9999.0


def test_geotiff_world_projection(tmp_path, arr):
    path = str(tmp_path / "w.tiff")
    g = soil.geotiff(arr)
    g.meta.scale = [2.0, 3.0, 1.0]
    g.meta.coords = [0, 0, 0, 10.0, 20.0, 0]
    g.write(path)
    g2 = soil.geotiff(path)
    np.testing.assert_allclose(g2.min, [10.0, 20.0])
    np.testing.assert_allclose(g2.max, [10.0 + 2.0 * 23, 20.0 + 3.0 * 19])


def test_tiff_reads_deflate_strips(tmp_path, arr):
    """Hand-build a deflate-compressed strip TIFF and read it back."""
    path = str(tmp_path / "z.tiff")
    soil.tiff(arr).write(path)
    # recompress: load raw, rewrite with deflate by patching the codec path
    data = arr.astype("<f4").tobytes()
    comp = zlib.compress(data)
    import struct

    H, W = arr.shape
    tags = [
        (256, 4, (W,)), (257, 4, (H,)), (258, 3, (32,)), (259, 3, (8,)),
        (262, 3, (1,)), (273, 4, None), (277, 3, (1,)), (278, 4, (H,)),
        (279, 4, (len(comp),)), (339, 3, (3,)),
    ]
    n = len(tags)
    ifd_size = 2 + n * 12 + 4
    data_off = 8 + ifd_size
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<H", 42) + struct.pack("<I", 8))
        f.write(struct.pack("<H", n))
        for tag, typ, vals in tags:
            if tag == 273:
                payload = struct.pack("<I", data_off)
                count = 1
            else:
                fmt = {3: "H", 4: "I"}[typ]
                payload = struct.pack("<" + fmt * len(vals), *vals).ljust(4, b"\0")
                count = len(vals)
            f.write(struct.pack("<HHI", tag, typ, count) + payload)
        f.write(struct.pack("<I", 0))
        f.write(comp)
    got, info = tiffcore.read(path)
    np.testing.assert_array_equal(got, arr)
    assert info.compression == 8


def test_tiff_reads_tiled(tmp_path):
    """Hand-build a tiled TIFF (2x2 tiles of 16x16) and read it back."""
    import struct

    path = str(tmp_path / "t.tiff")
    H = W = 24  # not a multiple of 16 -> tests edge cropping
    arr = np.arange(H * W, dtype=np.float32).reshape(H, W)
    tw = tl = 16
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tile = np.zeros((tl, tw), np.float32)
            ys = min(tl, H - ty * tl)
            xs = min(tw, W - tx * tw)
            tile[:ys, :xs] = arr[ty * tl : ty * tl + ys, tx * tw : tx * tw + xs]
            tiles.append(tile.astype("<f4").tobytes())

    ntags = 11
    ifd_size = 2 + ntags * 12 + 4
    # offsets array (4 tiles) needs overflow storage
    overflow_off = 8 + ifd_size
    offsets_off = overflow_off
    counts_off = offsets_off + 16
    data_off = counts_off + 16
    tile_offsets = []
    cursor = data_off
    for t in tiles:
        tile_offsets.append(cursor)
        cursor += len(t)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<H", 42) + struct.pack("<I", 8))
        f.write(struct.pack("<H", ntags))
        def entry(tag, typ, count, payload):
            f.write(struct.pack("<HHI", tag, typ, count) + payload)
        entry(256, 4, 1, struct.pack("<I", W))
        entry(257, 4, 1, struct.pack("<I", H))
        entry(258, 3, 1, struct.pack("<HH", 32, 0))
        entry(259, 3, 1, struct.pack("<HH", 1, 0))
        entry(262, 3, 1, struct.pack("<HH", 1, 0))
        entry(277, 3, 1, struct.pack("<HH", 1, 0))
        entry(322, 4, 1, struct.pack("<I", tw))
        entry(323, 4, 1, struct.pack("<I", tl))
        entry(324, 4, 4, struct.pack("<I", offsets_off))
        entry(325, 4, 4, struct.pack("<I", counts_off))
        entry(339, 3, 1, struct.pack("<HH", 3, 0))
        f.write(struct.pack("<I", 0))
        f.write(struct.pack("<4I", *tile_offsets))
        f.write(struct.pack("<4I", *[len(t) for t in tiles]))
        for t in tiles:
            f.write(t)
    got, info = tiffcore.read(path)
    assert info.tiled
    np.testing.assert_array_equal(got, arr)


def test_mesh_ply(tmp_path):
    h = np.array([[0.0, 1.0], [2.0, np.nan]], np.float32)
    m = soil.mesh(h, (1.0, 1.0, 1.0))
    assert len(m.vertices) == 3  # NaN vertex skipped
    assert len(m.faces) == 0  # no full quad
    h2 = np.random.default_rng(0).random((4, 5)).astype(np.float32)
    m2 = soil.mesh(h2, (1.0, 1.0, 2.0))
    assert len(m2.vertices) == 20
    assert len(m2.faces) == 2 * 3 * 4
    p_ascii = str(tmp_path / "m.ply")
    p_bin = str(tmp_path / "m_bin.ply")
    m2.write(p_ascii)
    m2.center().write_binary(p_bin)
    assert open(p_ascii).readline().strip() == "ply"
    assert open(p_bin, "rb").read(3) == b"ply"


def test_zip_save_load(tmp_path):
    out = str(tmp_path / "ckpt.zip")
    rng = np.random.default_rng(1)
    fields = {
        "height": rng.random((8, 9)).astype(np.float32),
        "discharge": rng.random((8, 9)).astype(np.float32),
    }
    zip_save(out, fields, pscale=(0.1, 0.2, 4.0))
    back = zip_load(out)
    assert set(back) == {"height", "discharge"}
    arr, meta = back["height"]
    np.testing.assert_array_equal(arr, fields["height"])
    np.testing.assert_allclose(meta.scale, [0.1, 0.2, 4.0])


def test_iter_tiff(tmp_path, arr):
    p1 = str(tmp_path / "a.tiff")
    p2 = str(tmp_path / "b.tiff")
    soil.tiff(arr).write(p1)
    soil.tiff(arr).write(p2)
    files = list(soil.util.iter_tiff(str(tmp_path)))
    assert len(files) == 2
    single = list(soil.util.iter_tiff(p1))
    assert single == [("a.tiff", p1)]


def test_lzw_rejects_corrupt_codes():
    """Only code == len(table) is the legal KwKwK case; anything beyond is a
    corrupt stream and must raise, matching the strict native decoder."""
    import struct

    import pytest as _pytest

    from soillib_tpu.io.tiffcore import _unpack_lzw

    def pack(codes, nbits=9):
        bits = "".join(format(c, f"0{nbits}b") for c in codes)
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))

    CLEAR, EOI = 256, 257
    # valid: CLEAR, 'A', KwKwK (code 258 == next slot), EOI
    assert _unpack_lzw(pack([CLEAR, 65, 258, EOI])) == b"AAA"
    # corrupt: code far beyond the next table slot
    with _pytest.raises(ValueError):
        _unpack_lzw(pack([CLEAR, 65, 400, EOI]))
    # corrupt: undefined code before any string
    with _pytest.raises(ValueError):
        _unpack_lzw(pack([CLEAR, 300, EOI]))
