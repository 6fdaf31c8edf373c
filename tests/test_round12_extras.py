"""Round-12: pure-numpy PPM decode closing the codec stub (VERDICT r11
item 4) — decode correctness, the encode/decode/resize/hash identity
chain, and the real-decode query's row-for-row match with the
synthetic-path twin (they share one oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_cdc_msk_spark.functions.codecs import (
    PpmError,
    decode_ppm,
    encode_ppm,
    luma_resize_32,
)
from flink_cdc_msk_spark.functions.phash import (
    phash63_from_cells,
    phash63_from_pixels,
)


def _rand_cells(rng, n=1):
    return rng.integers(0, 256, size=(n, 8, 8), dtype=np.int64)


def test_ppm_roundtrip_identity():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 96), dtype=np.int64).astype(
        np.uint8
    )
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = np.full((2, 3), 200, dtype=np.uint8)
    raw = encode_ppm(img)
    # splice spec-legal comments/whitespace into the header
    body = raw.split(b"\n", 3)
    hacked = (
        b"P6 # magic comment\n# full-line comment\n  3\t2 # dims\n255\n"
        + body[3]
    )
    assert np.array_equal(decode_ppm(hacked), img)


def test_ppm_luma_bt601_color():
    # one non-gray pixel: (299R + 587G + 114B + 500) // 1000
    rgb = bytes([250, 10, 100])
    payload = b"P6\n1 1\n255\n" + rgb
    want = (299 * 250 + 587 * 10 + 114 * 100 + 500) // 1000
    assert decode_ppm(payload)[0, 0] == want


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n1 1\n255\n" + b"\x00" * 3,      # wrong magic
        b"P6\n1 1\n65535\n" + b"\x00" * 6,    # 2-byte samples
        b"P6\n2 2\n255\n" + b"\x00" * 11,     # truncated raster
        b"P6\nx 1\n255\n" + b"\x00" * 3,      # non-numeric dim
        b"P6\n1",                              # truncated header
    ],
)
def test_ppm_malformed_raises(payload):
    with pytest.raises(PpmError):
        decode_ppm(payload)


def test_resize_box_mean_exact_on_constant_blocks():
    rng = np.random.default_rng(11)
    cells = _rand_cells(rng)[0].astype(np.uint8)
    up = np.repeat(np.repeat(cells, 8, axis=0), 8, axis=1)  # 64x64
    img32 = luma_resize_32(up)
    # 64x64 of 8x8-constant blocks -> each 2x2 box is constant
    want = np.repeat(np.repeat(cells, 4, axis=0), 4, axis=1)
    assert np.array_equal(img32, want)


def test_resize_rejects_non_multiples():
    with pytest.raises(NotImplementedError):
        luma_resize_32(np.zeros((33, 32), dtype=np.uint8))


@pytest.mark.parametrize("scale", [4, 8])
def test_full_decode_chain_equals_cell_hash(scale):
    """encode -> decode -> resize -> pixel DCT == cell DCT, bit-for-bit
    (the exactness chain the shared oracle rests on)."""
    rng = np.random.default_rng(scale)
    cells = _rand_cells(rng, n=16)
    imgs = [
        np.repeat(
            np.repeat(c.astype(np.uint8), scale, axis=0), scale, axis=1
        )
        for c in cells
    ]
    pixels = np.stack(
        [luma_resize_32(decode_ppm(encode_ppm(i))) for i in imgs]
    )
    assert np.array_equal(
        phash63_from_pixels(pixels), phash63_from_cells(cells)
    )


def test_decode_real_hook_ppm_and_compressed():
    from flink_cdc_msk_spark.operators.multimodal import _decode_real

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(_decode_real(encode_ppm(img), "ppm"), img)
    with pytest.raises(NotImplementedError):
        _decode_real(b"\xff\xd8\xff", "jpeg")


def test_real_decode_query_matches_synthetic_twin(spark):
    from flink_cdc_msk_spark.plans.round8_extras import (
        multimodal_phash_near_dup,
    )
    from flink_cdc_msk_spark.plans.round12_extras import (
        multimodal_phash_real_decode,
    )

    sf = "/root/testdata/sf0.001"
    real = sorted(
        map(str, multimodal_phash_real_decode(spark, sf).collect())
    )
    synth = sorted(
        map(str, multimodal_phash_near_dup(spark, sf).collect())
    )
    assert real == synth
    assert len(real) > 0  # the planted dups must actually surface
