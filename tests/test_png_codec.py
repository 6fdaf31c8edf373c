"""Round-12: pure stdlib-zlib + numpy PNG codec — the first genuinely
COMPRESSED format to decode natively (narrows the multimodal codec stub
to entropy coders the stdlib lacks: JPEG/MP3/...). Covers the filter/
unfilter inverse property for all five scanline filters, chunk/CRC
hygiene, BT.601 luma on truecolor, the exactness chain into the pHash,
and the mixed-format query's row-for-row match with the synthetic twin
(they share one oracle)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_cdc_msk_spark.functions.codecs import (
    PNG_SIG,
    PngError,
    _filter_scanline,
    _png_chunk,
    _unfilter_scanline,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    luma_resize_32,
)
from flink_cdc_msk_spark.functions.phash import (
    phash63_from_cells,
    phash63_from_pixels,
)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("bpp", [1, 3])
def test_filter_unfilter_inverse(ftype, bpp):
    """Forward filter (RFC 2083 §6, encode side) and inverse filter
    (decode side) are implemented independently; their composition must
    be the identity on every scanline."""
    rng = np.random.default_rng(ftype * 10 + bpp)
    prev = rng.integers(0, 256, size=24 * bpp, dtype=np.int64)
    raw = rng.integers(0, 256, size=24 * bpp, dtype=np.int64)
    fl = _filter_scanline(ftype, raw, prev, bpp).astype(np.int64)
    assert np.array_equal(_unfilter_scanline(ftype, fl, prev, bpp), raw)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("rgb", [False, True])
def test_png_roundtrip_each_filter(ftype, rgb):
    rng = np.random.default_rng(ftype + (10 if rgb else 0))
    img = rng.integers(0, 256, size=(13, 37), dtype=np.uint8)
    assert np.array_equal(
        decode_png(encode_png(img, rgb=rgb, row_filters=ftype)), img
    )


def test_png_roundtrip_mixed_row_filters():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    filters = [y % 5 for y in range(64)]  # the media builder's choice
    for rgb in (False, True):
        assert np.array_equal(
            decode_png(encode_png(img, rgb=rgb, row_filters=filters)), img
        )


def test_png_luma_bt601_truecolor():
    # hand-build a 1x1 truecolor PNG with DISTINCT R,G,B (encode_png
    # only writes R=G=B): filter byte 0 + raw pixel
    idat = zlib.compress(b"\x00" + bytes([250, 10, 100]))
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    want = (299 * 250 + 587 * 10 + 114 * 100 + 500) // 1000
    assert decode_png(payload)[0, 0] == want


def test_png_multi_idat_concatenation():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = encode_png(img)
    # split the single IDAT into two chunks at an arbitrary byte
    sig_ihdr = raw[: 8 + 12 + 13]
    (ilen,) = struct.unpack(">I", raw[33:37])
    idat_body = raw[41 : 41 + ilen]
    tail = raw[41 + ilen + 4 :]  # IEND chunk
    a, b = idat_body[:5], idat_body[5:]
    hacked = (
        sig_ihdr + _png_chunk(b"IDAT", a) + _png_chunk(b"IDAT", b) + tail
    )
    assert np.array_equal(decode_png(hacked), img)


def test_png_crc_corruption_raises():
    raw = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    raw[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(raw))


def test_png_malformed_raises():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"\x89PNx" + b"\x00" * 20)
    # garbage IDAT: valid chunk framing, invalid zlib stream
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", b"not-a-zlib-stream")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="inflate"):
        decode_png(payload)
    # wrong decompressed size (1x1 gray needs 2 bytes, give 5)
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="size"):
        decode_png(payload)
    with pytest.raises(PngError, match="IHDR"):
        decode_png(PNG_SIG + _png_chunk(b"IEND", b""))


@pytest.mark.parametrize(
    "depth,ctype,interlace",
    [(16, 0, 0), (8, 3, 0), (8, 4, 0), (8, 6, 0), (8, 0, 1)],
)
def test_png_unsupported_features_declared(depth, ctype, interlace):
    payload = (
        PNG_SIG
        + _png_chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, interlace),
        )
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_decode_image_sniffs_formats():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_decode_real_hook_png():
    from flink_cdc_msk_spark.operators.multimodal import _decode_real

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(_decode_real(encode_png(img), "png"), img)


@pytest.mark.parametrize("rgb", [False, True])
def test_png_decode_chain_equals_cell_hash(rgb):
    """encode_png -> decode -> resize -> pixel DCT == cell DCT,
    bit-for-bit, with every scanline filter in play — the exactness
    chain that lets the mixed-format query share PHASH_ORACLE."""
    rng = np.random.default_rng(3 if rgb else 5)
    cells = rng.integers(0, 256, size=(16, 8, 8), dtype=np.int64)
    pixels = np.stack(
        [
            luma_resize_32(
                decode_png(
                    encode_png(
                        np.repeat(
                            np.repeat(c.astype(np.uint8), 8, axis=0),
                            8,
                            axis=1,
                        ),
                        rgb=rgb,
                        row_filters=[y % 5 for y in range(64)],
                    )
                )
            )
            for c in cells
        ]
    )
    assert np.array_equal(
        phash63_from_pixels(pixels), phash63_from_cells(cells)
    )


def test_mixed_format_query_matches_synthetic_twin(spark):
    from flink_cdc_msk_spark.plans.round8_extras import (
        multimodal_phash_near_dup,
    )
    from flink_cdc_msk_spark.plans.round12_extras import (
        multimodal_phash_mixed_format,
    )

    sf = "/root/testdata/sf0.001"
    mixed = sorted(
        map(str, multimodal_phash_mixed_format(spark, sf).collect())
    )
    synth = sorted(
        map(str, multimodal_phash_near_dup(spark, sf).collect())
    )
    assert mixed == synth
    assert len(mixed) > 0  # planted dups surface across formats
