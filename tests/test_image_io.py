"""Round-trip tests for the dependency-free image I/O (io/image.py)."""

import numpy as np

from stratum_tpu.io import image as sio


def test_png_roundtrip(tmp_path, rng_np):
    img = (rng_np.random((13, 17, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    sio.write_png(p, img)
    back = sio.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_from_float(tmp_path):
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = tmp_path / "t.png"
    sio.write_png(p, img)
    back = sio.read_png(p)
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_hdr_roundtrip(tmp_path, rng_np):
    img = (rng_np.random((9, 11, 3)) * 40.0).astype(np.float32)
    img[0, 0] = 0.0
    p = tmp_path / "t.hdr"
    sio.write_hdr(p, img)
    back = sio.read_hdr(p)
    # RGBE precision: +-0.5 ULP of the shared 8-bit mantissa, i.e. relative
    # to the per-pixel max channel
    bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
    assert (np.abs(back - img) <= bound).all()


def test_pfm_roundtrip(tmp_path, rng_np):
    img = rng_np.random((5, 7, 3)).astype(np.float32)
    p = tmp_path / "t.pfm"
    sio.write_pfm(p, img)
    np.testing.assert_array_equal(sio.read_pfm(p), img)


def test_exr_roundtrip(tmp_path):
    """Uncompressed FLOAT EXR write/read is exact (reference uses tinyexr,
    Core/Image.cpp:60)."""
    import numpy as np

    from stratum_tpu.io import image as sio

    img = (np.random.default_rng(3).random((21, 37, 3)) * 8).astype(
        np.float32
    )
    p = tmp_path / "t.exr"
    sio.write_exr(p, img)
    back = sio.read_exr(p)
    np.testing.assert_array_equal(back, img)
    # dispatcher roundtrip
    sio.save_image(str(p), img)
    np.testing.assert_array_equal(sio.load_image(str(p)), img)


def test_exr_zip_and_half_read(tmp_path):
    """read_exr decodes ZIPS-compressed HALF scanlines (the forward filter
    here is the OpenEXR interleave+delta+deflate from ImfZip)."""
    import struct
    import zlib

    import numpy as np

    from stratum_tpu.io import image as sio

    rng = np.random.default_rng(5)
    h, w = 9, 13
    img = (rng.random((h, w, 3)) * 4).astype(np.float16)

    def exr_attr(name, typ, data):
        return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data

    chan = b""
    for name in (b"B", b"G", b"R"):
        chan += name + b"\x00" + struct.pack("<IIII", 1, 0, 1, 1)  # HALF
    chan += b"\x00"
    header = exr_attr(b"channels", b"chlist", chan)
    header += exr_attr(b"compression", b"compression", b"\x02")  # ZIPS
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += exr_attr(b"dataWindow", b"box2i", box)
    header += exr_attr(b"displayWindow", b"box2i", box)
    header += exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"
    preamble = struct.pack("<II", 20000630, 2) + header

    def zip_filter(raw: bytes) -> bytes:
        # OpenEXR ImfZip compress: interleave split + delta + deflate
        a = np.frombuffer(raw, np.uint8)
        half = (len(a) + 1) // 2
        t = np.zeros(len(a), np.uint8)
        t[:half] = a[0::2]
        t[half:] = a[1::2]
        d = t.astype(np.int16)
        d[1:] = (d[1:] - d[:-1] + 128) % 256
        return zlib.compress(d.astype(np.uint8).tobytes())

    chunks = []
    for y in range(h):
        raw = (
            img[y, :, 2].tobytes()
            + img[y, :, 1].tobytes()
            + img[y, :, 0].tobytes()
        )
        comp = zip_filter(raw)
        if len(comp) >= len(raw):
            comp = raw
        chunks.append(struct.pack("<ii", y, len(comp)) + comp)
    offset0 = len(preamble) + 8 * h
    offs = []
    acc = offset0
    for c in chunks:
        offs.append(acc)
        acc += len(c)
    table = struct.pack("<" + "Q" * h, *offs)
    p = tmp_path / "zips.exr"
    p.write_bytes(preamble + table + b"".join(chunks))

    back = sio.read_exr(p)
    np.testing.assert_allclose(back, img.astype(np.float32), atol=0, rtol=0)
