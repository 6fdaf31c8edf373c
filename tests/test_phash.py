"""DCT pHash validation (VERDICT r10 item 3).

Three layers: pure-numpy properties of the fixed-point DCT hash
(no session needed), the Spark pipeline's bit-parity with the numpy
reference across the Arrow boundary, and the detection semantics of
the registered query (clone recall stays pinned in
test_round8_extras; the DuckDB-oracle equality runs in the
parameterized oracle gate like every registered query).
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_cdc_msk_spark.functions.phash import (
    N_BITS,
    PHASH_BAND_BITS,
    PHASH_BANDS,
    PHASH_HAM_MAX,
    _c32_float,
    c32_fixed,
    cell_basis_fixed,
    phash63_from_cells,
    phash63_from_pixels,
)

RNG = np.random.RandomState(11)


def _hamming(a, b):
    return [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]


def test_cells_pixels_identity():
    """A 32x32 image constant on 4x4 cells must hash identically through
    the full-resolution path and the cell fast path — the exact identity
    that justifies hashing the synthetic raster at cell granularity.
    Holds because the cell basis is the SUM OF THE ROUNDED full basis
    (see cell_basis_fixed)."""
    cells = RNG.randint(0, 256, size=(64, 8, 8))
    pixels = np.repeat(np.repeat(cells, 4, axis=1), 4, axis=2)
    assert np.array_equal(
        phash63_from_cells(cells), phash63_from_pixels(pixels)
    )


def test_hash_is_nonnegative_with_at_most_31_bits():
    """63 coefficients strictly above their own median: <= 31 bits set,
    so the pack always fits a non-negative signed long (both engines)."""
    h = phash63_from_cells(RNG.randint(0, 256, size=(256, 8, 8)))
    assert (h >= 0).all()
    assert max(bin(int(x)).count("1") for x in h) <= 31


def test_fixed_point_matches_float_dct():
    """The integer basis is a 2^20-scaled orthonormal 32-point DCT-II:
    descaled coefficients must agree with the float DCT to ~1e-2 abs
    (coefficient magnitudes are O(10^2..10^4) — the fixed-point error
    is ~7 orders below signal)."""
    cells = RNG.randint(0, 256, size=(16, 8, 8))
    pixels = np.repeat(np.repeat(cells, 4, axis=1), 4, axis=2)
    c_float = _c32_float()
    d_float = np.einsum("pi,bij,qj->bpq", c_float, pixels.astype(float), c_float)
    b = cell_basis_fixed()
    d_int = np.einsum("pu,buv,qv->bpq", b, cells.astype(np.int64), b)
    descale = float(1 << 20) ** 2
    assert np.abs(d_int / descale - d_float).max() < 0.05


def test_basis_orthonormality():
    """Rows of the float basis are orthonormal (DCT-II with the
    sqrt(1/N)/sqrt(2/N) normalization)."""
    c = _c32_float()
    gram = c @ c.T
    assert np.allclose(gram, np.eye(8), atol=1e-12)
    # and the fixed-point basis is its 2^20 rounding, entry-wise
    assert np.abs(c32_fixed() - c * (1 << 20)).max() <= 0.5


def test_perturbation_locality():
    """The pHash property: a small local change (one cell bumped) flips
    only a few bits; an unrelated image lands near 63/2. This is what
    the DCT buys over a direct bit hash — without it any cell change
    avalanches half the bits."""
    cells = RNG.randint(0, 256, size=(128, 8, 8))
    bumped = cells.copy()
    bumped[:, 2, 5] = np.clip(bumped[:, 2, 5] + 10, 0, 255)
    ham_near = _hamming(phash63_from_cells(cells), phash63_from_cells(bumped))
    assert max(ham_near) <= PHASH_HAM_MAX
    other = RNG.randint(0, 256, size=(128, 8, 8))
    ham_far = _hamming(phash63_from_cells(cells), phash63_from_cells(other))
    assert np.mean(ham_far) > 20
    assert min(ham_far) > PHASH_HAM_MAX


def test_band_pigeonhole_guarantee():
    """7 bands x 9 bits cover all 63 bits exactly; flipping
    PHASH_HAM_MAX bits can dirty at most PHASH_HAM_MAX bands, leaving
    >= 1 clean — candidate recall at the admit threshold is structural.
    Verified by adversarial placement: spread the flips over distinct
    bands (the worst case)."""
    assert PHASH_BANDS * PHASH_BAND_BITS == N_BITS
    assert PHASH_HAM_MAX < PHASH_BANDS
    h = int(phash63_from_cells(RNG.randint(0, 256, size=(1, 8, 8)))[0])
    flipped = h
    for b in range(PHASH_HAM_MAX):  # one flip in each of 6 bands
        flipped ^= 1 << (b * PHASH_BAND_BITS)
    clean = [
        b
        for b in range(PHASH_BANDS)
        if ((h >> (b * PHASH_BAND_BITS)) & 511)
        == ((flipped >> (b * PHASH_BAND_BITS)) & 511)
    ]
    assert clean  # at least one band survives


def test_spark_pipeline_bit_parity_with_numpy(spark):
    """Across the JVM->Arrow->numpy boundary: hashes from the registered
    pipeline's expressions (JVM md5 cells + pandas-UDF DCT) must equal
    the pure-numpy reference applied to the same cells — pinning that
    the JVM cell computation, the Arrow transfer, and the UDF reshape
    agree bit-for-bit."""
    import hashlib

    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.functions.phash import phash63, synthetic_cells

    docs = spark.createDataFrame(
        [(i, f"payload number {i} " * (3 + i % 5)) for i in range(40)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id",
            phash63(F.array(*synthetic_cells(F.col("text")))).alias("h"),
        ).collect()
    }

    def ref_cells(text: str) -> np.ndarray:
        n = len(text)
        out = np.empty((8, 8), dtype=np.int64)
        blen = max(n // 64, 1)
        for c in range(64):
            start = c * n // 64  # 0-based; Spark substr is 1-based
            chunk = text[start : start + blen]
            out[c // 8, c % 8] = int(
                hashlib.md5(chunk.encode()).hexdigest()[:2], 16
            )
        return out

    for i in range(40):
        text = f"payload number {i} " * (3 + i % 5)
        expect = int(phash63_from_cells(ref_cells(text)[None, :, :])[0])
        assert got[i] == expect, f"doc {i}: {got[i]} != {expect}"


def test_clone_pairs_hamming_zero_and_exact_output(spark):
    """Planted clones hash identically (hamming 0) and the registered
    query emits each such pair exactly once (lowest-band dedup)."""
    from flink_cdc_msk_spark.plans import round8_extras as r8

    out = r8.multimodal_phash_near_dup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.media_id_1, r.media_id_2) for r in out}
    assert len(pairs) == len(out)  # exactly-once emission
    clone = [r for r in out if r.media_id_2 - r.media_id_1 == 1_000_000]
    assert clone and all(r.hamming == 0 for r in clone)
