"""GeoTIFF IO tests: round trips across dtypes/compression, geo + RPC tags,
and interop with PIL-written TIFFs."""

import numpy as np
import pytest

from satnerf_tpu.geo import RPCModel
from satnerf_tpu.io import GeoProfile, read_geotiff, write_geotiff
from satnerf_tpu.io.image import load_cls_tensor, load_rgb_tensor, save_output_image
from satnerf_tpu.io.tiff import epsg_for_utm


@pytest.mark.parametrize("dtype,count,compress", [
    ("uint8", 3, True),
    ("uint8", 1, False),
    ("float32", 1, True),
    ("float64", 1, False),
    ("uint16", 4, True),
    ("int16", 1, True),
])
def test_roundtrip(tmp_path, dtype, count, compress):
    rng = np.random.default_rng(0)
    if dtype.startswith("float"):
        arr = rng.normal(size=(count, 21, 33)).astype(dtype)
    else:
        arr = rng.integers(0, 200, (count, 21, 33)).astype(dtype)
    fp = str(tmp_path / "x.tif")
    profile = GeoProfile(width=33, height=21, count=count, dtype=dtype)
    write_geotiff(fp, arr, profile, compress=compress)
    back, prof = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)
    assert prof.dtype == dtype and prof.count == count


def test_geo_tags_roundtrip(tmp_path):
    arr = np.zeros((1, 10, 12), np.float32)
    profile = GeoProfile(
        width=12, height=10, count=1, dtype="float32",
        transform=(0.5, 0.5, 435000.0, 3354000.0),
        epsg=epsg_for_utm("17R"), nodata=float("nan"),
    )
    fp = str(tmp_path / "dsm.tif")
    write_geotiff(fp, arr, profile)
    _, prof = read_geotiff(fp)
    assert prof.transform == (0.5, 0.5, 435000.0, 3354000.0)
    assert prof.epsg == 32617
    assert np.isnan(prof.nodata)
    # pixel <-> utm mapping
    x, y = prof.pixel_to_xy(4, 2)
    assert (x, y) == (435002.0, 3353999.0)
    c, r = prof.xy_to_pixel(x, y)
    assert (c, r) == (4.0, 2.0)


def test_rpc_tag_roundtrip(tmp_path):
    rpc = RPCModel(
        row_offset=100, col_offset=100, lat_offset=30.3, lon_offset=-81.6,
        alt_offset=20, row_scale=100, col_scale=100, lat_scale=0.01,
        lon_scale=0.01, alt_scale=80,
    )
    rpc.col_num[1] = 1.0
    rpc.row_num[2] = -1.0
    arr = np.zeros((3, 6, 6), np.uint8)
    fp = str(tmp_path / "rpc.tif")
    write_geotiff(fp, arr, GeoProfile(6, 6, 3, "uint8", rpc=rpc))
    _, prof = read_geotiff(fp)
    assert prof.rpc is not None
    np.testing.assert_allclose(prof.rpc.col_num, rpc.col_num)
    assert prof.rpc.lat_offset == 30.3


def test_pil_interop(tmp_path):
    """Read a TIFF written by PIL (uncompressed path, foreign producer)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (17, 23, 3)).astype(np.uint8)
    fp = str(tmp_path / "pil.tif")
    Image.fromarray(img).save(fp, compression=None)
    arr, prof = read_geotiff(fp)
    np.testing.assert_array_equal(np.moveaxis(arr, 0, -1), img)

    # and PIL can read ours back
    fp2 = str(tmp_path / "ours.tif")
    write_geotiff(fp2, np.moveaxis(img, -1, 0), GeoProfile(23, 17, 3, "uint8"))
    back = np.asarray(Image.open(fp2))
    np.testing.assert_array_equal(back, img)


def test_image_helpers(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (3, 9, 11)).astype(np.uint8)
    fp = str(tmp_path / "img_RGB.tif")
    write_geotiff(fp, rgb, GeoProfile(11, 9, 3, "uint8"))
    flat = load_rgb_tensor(fp)
    assert flat.shape == (99, 3)
    assert flat.max() <= 1.0

    cls = rng.integers(0, 5, (1, 9, 11)).astype(np.uint8)
    fp2 = str(tmp_path / "img_CLS.tif")
    write_geotiff(fp2, cls, GeoProfile(11, 9, 1, "uint8"))
    labels = load_cls_tensor(fp2)
    assert labels.shape == (99, 1)
    np.testing.assert_array_equal(labels[:, 0], cls[0].reshape(-1))

    # save with copied tags
    pred = rng.normal(size=(9, 11)).astype(np.float32)
    out = str(tmp_path / "pred.tif")
    save_output_image(pred, out, source_fp=fp)
    arr, _ = read_geotiff(out)
    np.testing.assert_allclose(arr[0], pred)


def _predictor3_encode(block: np.ndarray) -> bytes:
    """Forward TIFF predictor 3 (TechNote 3): per row, split value bytes
    into MSB-first byte planes, then byte-difference the plane stream."""
    h, w = block.shape
    itemsize = block.dtype.itemsize
    be = block.astype(block.dtype.newbyteorder(">"))
    b = np.frombuffer(be.tobytes(), np.uint8).reshape(h, w, itemsize)
    planes = np.moveaxis(b, 2, 1).reshape(h, itemsize * w)
    diff = np.diff(planes.astype(np.int16), axis=1, prepend=0).astype(np.uint8)
    return diff.tobytes()


def _write_tiled_tiff(fp, arr, tile=16, compress=True, predictor=1):
    """Minimal tiled-TIFF writer for testing the reader's tile path
    (GDAL-style: row-major tile grid, edge tiles padded)."""
    import struct
    import zlib

    h, w = arr.shape
    ty = (h + tile - 1) // tile
    tx = (w + tile - 1) // tile
    tiles = []
    for j in range(ty):
        for i in range(tx):
            block = np.zeros((tile, tile), arr.dtype)
            sub = arr[j * tile : (j + 1) * tile, i * tile : (i + 1) * tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            raw = _predictor3_encode(block) if predictor == 3 else block.tobytes()
            tiles.append(zlib.compress(raw) if compress else raw)

    bits = arr.dtype.itemsize * 8
    sample_format = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    n_tags = 13
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    ext = ifd_off + ifd_size
    offsets_payload_off = ext
    counts_payload_off = offsets_payload_off + 4 * len(tiles)
    data_off = counts_payload_off + 4 * len(tiles)
    offs, cur = [], data_off
    for t in tiles:
        offs.append(cur)
        cur += len(t)

    def entry(tid, ftype, n, value):
        return struct.pack("<HHI", tid, ftype, n) + value

    e = []
    e.append(entry(256, 4, 1, struct.pack("<I", w)))
    e.append(entry(257, 4, 1, struct.pack("<I", h)))
    e.append(entry(258, 3, 1, struct.pack("<HH", bits, 0)))
    e.append(entry(259, 3, 1, struct.pack("<HH", 8 if compress else 1, 0)))
    e.append(entry(262, 3, 1, struct.pack("<HH", 1, 0)))
    e.append(entry(277, 3, 1, struct.pack("<HH", 1, 0)))
    e.append(entry(284, 3, 1, struct.pack("<HH", 1, 0)))
    e.append(entry(317, 3, 1, struct.pack("<HH", predictor, 0)))
    e.append(entry(322, 4, 1, struct.pack("<I", tile)))
    e.append(entry(323, 4, 1, struct.pack("<I", tile)))
    e.append(entry(324, 4, len(tiles), struct.pack("<I", offsets_payload_off)))
    e.append(entry(325, 4, len(tiles), struct.pack("<I", counts_payload_off)))
    e.append(entry(339, 3, 1, struct.pack("<HH", sample_format, 0)))
    out = bytearray(b"II*\0" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_tags) + b"".join(e) + struct.pack("<I", 0)
    out += struct.pack("<%dI" % len(tiles), *offs)
    out += struct.pack("<%dI" % len(tiles), *[len(t) for t in tiles])
    for t in tiles:
        out += t
    fp.write_bytes(bytes(out))


@pytest.mark.parametrize("dtype", ["uint8", "float32"])
@pytest.mark.parametrize("compress", [True, False])
def test_tiled_tiff_read(tmp_path, dtype, compress):
    # 37x29 exercises partial edge tiles in both axes
    rng = np.random.default_rng(0)
    if dtype == "uint8":
        arr = rng.integers(0, 255, (37, 29)).astype(np.uint8)
    else:
        arr = rng.normal(size=(37, 29)).astype(np.float32)
    fp = tmp_path / "tiled.tif"
    _write_tiled_tiff(fp, arr, tile=16, compress=compress)
    got, profile = read_geotiff(str(fp))
    assert profile.width == 29 and profile.height == 37
    np.testing.assert_array_equal(got[0], arr)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_predictor3_tiled_read(tmp_path, dtype):
    """Predictor 3 (float byte-shuffle differencing, common on
    GDAL-written float DSM rasters) decodes bit-exactly, incl. partial
    edge tiles."""
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(37, 29)).astype(dtype)
    fp = tmp_path / "pred3.tif"
    _write_tiled_tiff(fp, arr, tile=16, compress=True, predictor=3)
    got, _ = read_geotiff(str(fp))
    np.testing.assert_array_equal(got[0], arr)


def test_predictor3_strip_read(tmp_path):
    """Predictor 3 through the strip path (one strip, deflate)."""
    import struct
    import zlib

    rng = np.random.default_rng(2)
    arr = rng.normal(size=(9, 11)).astype(np.float32)
    payload = zlib.compress(_predictor3_encode(arr))

    def entry(tid, ftype, n, value):
        return struct.pack("<HHI", tid, ftype, n) + value

    n_tags = 11
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4
    e = [
        entry(256, 4, 1, struct.pack("<I", 11)),
        entry(257, 4, 1, struct.pack("<I", 9)),
        entry(258, 3, 1, struct.pack("<HH", 32, 0)),
        entry(259, 3, 1, struct.pack("<HH", 8, 0)),
        entry(262, 3, 1, struct.pack("<HH", 1, 0)),
        entry(273, 4, 1, struct.pack("<I", data_off)),
        entry(277, 3, 1, struct.pack("<HH", 1, 0)),
        entry(278, 4, 1, struct.pack("<I", 9)),
        entry(279, 4, 1, struct.pack("<I", len(payload))),
        entry(317, 3, 1, struct.pack("<HH", 3, 0)),
        entry(339, 3, 1, struct.pack("<HH", 3, 0)),
    ]
    out = bytearray(b"II*\0" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_tags) + b"".join(e) + struct.pack("<I", 0)
    out += payload
    fp = tmp_path / "pred3_strip.tif"
    fp.write_bytes(bytes(out))
    got, _ = read_geotiff(str(fp))
    np.testing.assert_array_equal(got[0], arr)


def test_unknown_predictor_raises(tmp_path):
    """An unsupported predictor must fail loudly, never decode garbage."""
    arr = np.zeros((8, 8), np.float32)
    fp = tmp_path / "pred9.tif"
    _write_tiled_tiff(fp, arr, tile=8, compress=False, predictor=9)
    with pytest.raises(NotImplementedError, match="predictor 9"):
        read_geotiff(str(fp))


class TestNativeLZW:
    """C++ LZW decoder (sn_lzw_decode) vs the pure-python fallback."""

    @staticmethod
    def _lzw_encode(data: bytes) -> bytes:
        """Minimal TIFF-LZW encoder (MSB-first, early change) for fixtures."""
        out = bytearray()
        acc = 0
        nbits = 0
        bits = 9

        def put(code):
            nonlocal acc, nbits
            acc = (acc << bits) | code
            nbits += bits
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        table = {bytes([i]): i for i in range(256)}
        nxt = 258
        put(256)  # CLEAR
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            put(table[w])
            table[wc] = nxt
            nxt += 1
            # early change: the encoder runs one entry ahead of the decoder
            # (which appends lazily), so it widens when nxt hits 1<<bits —
            # the same code index where the decoder's table reaches
            # (1<<bits)-1 and IT widens
            if nxt >= (1 << bits) and bits < 12:
                bits += 1
            if nxt >= 4094:
                put(256)
                table = {bytes([i]): i for i in range(256)}
                nxt = 258
                bits = 9
            w = bytes([ch])
        if w:
            put(table[w])
        put(257)  # EOI
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    def _roundtrip(self, payload: bytes):
        from satnerf_tpu.io.tiff import _lzw_decode, _lzw_decode_py
        from satnerf_tpu.ops import native

        stream = self._lzw_encode(payload)
        assert _lzw_decode_py(stream) == payload
        if native.get_lib() is not None:
            assert _lzw_decode(stream, len(payload)) == payload
            assert _lzw_decode(stream, 0) == payload  # no size hint path

    def test_random_bytes(self):
        rng = np.random.default_rng(0)
        self._roundtrip(rng.integers(0, 256, 5000, dtype=np.uint8).tobytes())

    def test_repetitive_kwkwk(self):
        # long runs exercise the KwKwK code path and table growth
        self._roundtrip(b"abababab" * 600 + b"\x00" * 3000 + b"xyz" * 1000)

    def test_large_blob_matches_python(self):
        rng = np.random.default_rng(1)
        # compressible structured data big enough to cross several width
        # bumps and a table reset
        payload = np.repeat(
            rng.integers(0, 64, 30000, dtype=np.uint8), 3
        ).tobytes()
        self._roundtrip(payload)

    def test_lzw_geotiff_roundtrip_via_pil(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(2)
        arr = rng.integers(0, 255, (75, 60), dtype=np.uint8)
        fp = str(tmp_path / "lzw.tif")
        PIL.fromarray(arr).save(fp, compression="tiff_lzw")
        from satnerf_tpu.io.tiff import read_geotiff

        out, _ = read_geotiff(fp)
        np.testing.assert_array_equal(out[0], arr)

    def test_truncated_stream_does_not_crash(self):
        """A truncated LZW stream must fail loudly or return a short
        result — never crash the process (native path returns what it has
        or -2; python path raises or returns short)."""
        from satnerf_tpu.io.tiff import _lzw_decode

        rng = np.random.default_rng(3)
        payload = np.repeat(
            rng.integers(0, 64, 4000, dtype=np.uint8), 2
        ).tobytes()
        stream = self._lzw_encode(payload)
        for cut in (1, len(stream) // 3, len(stream) - 2):
            try:
                out = _lzw_decode(stream[:cut], len(payload))
            except Exception:
                continue  # a raised error is an acceptable outcome
            assert len(out) <= len(payload)
            assert out == payload[: len(out)]

    def test_empty_stream_decodes_empty(self):
        # 9-bit MSB codes: 256 (CLEAR) then 257 (EOI) => valid empty stream
        from satnerf_tpu.io.tiff import _lzw_decode

        assert _lzw_decode(bytes([0x80, 0x40, 0x40]), 0) == b""

    def test_garbage_stream_hits_native_minus2_and_python_raises(self):
        """A high code before any literal: the native decoder must reject
        it with -2 (corrupt stream), and _lzw_decode's fallback to the
        python decoder then fails loudly (IndexError) rather than
        returning silent garbage."""
        import pytest

        from satnerf_tpu.io.tiff import _lzw_decode
        from satnerf_tpu.ops import native

        # first 9-bit code = 300 (0b100101100): invalid as an initial code
        garbage = bytes([0b10010110, 0b00000000])
        lib = native.get_lib()
        if lib is not None and hasattr(lib, "sn_lzw_decode"):
            src = np.frombuffer(garbage, dtype=np.uint8)
            out = np.empty(64, dtype=np.uint8)
            rc = lib.sn_lzw_decode(
                native.as_u8_ptr(src), len(garbage), native.as_u8_ptr(out), 64
            )
            assert rc == -2
        with pytest.raises(IndexError):
            _lzw_decode(garbage, 64)
