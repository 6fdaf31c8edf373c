"""True 32×32 DCT perceptual hash (pHash), pure numpy, fixed-point.

Replaces the round-8 proportional-block stand-in (VERDICT r10 item 3):
the classic pHash pipeline — resize to 32×32 luma, 2-D DCT-II, keep the
8×8 low-frequency block, threshold each AC coefficient against the
median — with every step real except the image DECODE, which stays
behind the declared codec stub (operators/multimodal.py:69; no imaging
libraries ship in this container). In its place the media payload is
"decoded" by a deterministic synthetic rasterizer: an 8×8 grid of 4×4
constant cells, each cell's luma the first md5 byte of the
proportionally-positioned payload chunk — reproducible in portable SQL,
so the whole hash (DCT included) carries a FULL DuckDB oracle.

Why fixed-point: both engines must agree on every hash BIT, and float
DCT sums are summation-order-sensitive (numpy reduces pairwise, SQL
SUM() sequentially — last-ulp differences flip median-threshold bits).
The basis is therefore scaled to integers (round(2^20·C), the JPEG
fixed-point-DCT trick): coefficients become exact int64 arithmetic —
|cell| ≤ 255, |basis| ≤ 2^20, 64-term sums bound the coefficient by
~2^54 — identical in numpy, Spark, and DuckDB regardless of order.

Two entry points, exactly equal on piecewise-constant images:

- :func:`phash63_from_cells` — (B, 8, 8) cell lumas → int64 hash. The
  production path for the synthetic rasterizer, and the fast path for
  any decoder that downsamples to 8×8 means. Uses the CELL basis
  ``B(p,u) = Σ_d C_int(p, 4u+d)`` (sum of the rounded 32-point basis,
  NOT a re-rounded sum — that exact choice makes the identity below
  hold bit-for-bit).
- :func:`phash63_from_pixels` — (B, 32, 32) pixels → int64 hash, the
  full-resolution form for a real codec. For an image that is constant
  on 4×4 cells, ``phash63_from_pixels(upsample(cells)) ==
  phash63_from_cells(cells)`` exactly (property-tested).

Hash layout: 63 bits, one per AC coefficient (p, q) ≠ (0, 0) of the
8×8 low-frequency block, bit index ``p·8 + q - 1``; a bit is 1 iff its
coefficient strictly exceeds the median (32nd-smallest of the 63). At
most 31 bits are set, so the hash is a non-negative int64 in both
engines. DC is dropped — it is plain mean brightness, carries no
structure, and 63 bits keep the pack inside a signed long.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

N_PIX = 32  # conceptual raster resolution (the "resize to 32×32" step)
N_CELL = 8  # synthetic-decode cell grid == low-frequency block size
CELL_W = N_PIX // N_CELL  # 4×4 pixels per cell
SCALE_BITS = 20  # fixed-point scale of the DCT basis
N_BITS = 63  # AC coefficients of the 8×8 block
PHASH_BANDS = 7  # 9-bit LSH bands; 7 bands guarantee recall at ham<=6
PHASH_BAND_BITS = 9
PHASH_HAM_MAX = 6  # pigeonhole: ham<=6 over 7 bands -> >=1 clean band


def _c32_float() -> np.ndarray:
    """(8, 32) — rows p = 0..7 of the orthonormal 32-point DCT-II basis:
    C(0,i) = sqrt(1/32), C(p,i) = sqrt(2/32)·cos(π(2i+1)p/64)."""
    out = np.empty((N_CELL, N_PIX))
    for p in range(N_CELL):
        scale = math.sqrt((1 if p == 0 else 2) / N_PIX)
        for i in range(N_PIX):
            out[p, i] = scale * math.cos(math.pi * (2 * i + 1) * p / (2 * N_PIX))
    return out


def c32_fixed() -> np.ndarray:
    """int64 (8, 32): round(2^SCALE_BITS · C32) — the full-resolution
    fixed-point basis used by :func:`phash63_from_pixels`."""
    return np.rint(_c32_float() * (1 << SCALE_BITS)).astype(np.int64)


def cell_basis_fixed() -> np.ndarray:
    """int64 (8, 8): B(p,u) = Σ_{d=0..3} c32_fixed()(p, 4u+d).

    Summing the ROUNDED full basis (instead of rounding the summed float
    basis) is what makes the cells/pixels identity exact: the pixel path
    applies c32_fixed() to 4 equal pixels per cell, which is literally
    this sum."""
    c = c32_fixed()
    return c.reshape(N_CELL, N_CELL, CELL_W).sum(axis=2)


def _pack_bits(coef: np.ndarray) -> np.ndarray:
    """(B, 8, 8) int64 DCT coefficients → (B,) int64 hashes (shared
    tail: drop DC, median-threshold, pack)."""
    flat = coef.reshape(coef.shape[0], N_CELL * N_CELL)[:, 1:]  # drop (0,0)
    med = np.partition(flat, N_BITS // 2, axis=1)[:, N_BITS // 2]
    bits = (flat > med[:, None]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(N_BITS, dtype=np.uint64)
    return (bits * weights).sum(axis=1).astype(np.int64)


def phash63_from_cells(cells: np.ndarray) -> np.ndarray:
    """(B, 8, 8) integer cell lumas (0..255) → (B,) int64 pHash.

    B @ X @ B^T as two chained matmuls, not a 3-operand einsum: the
    un-optimized einsum contracts all four indices at once (B·8⁴ ops);
    the staged form is B·2·8³ — 8× fewer, and bit-identical because
    int64 arithmetic is exact (worst case |B·X| ≤ 8·2^20·255 ≈ 2^31,
    final ≤ 8·2^31·2^20 ≈ 2^54 — no overflow)."""
    b = cell_basis_fixed()
    coef = b @ cells.astype(np.int64) @ b.T
    return _pack_bits(coef)


def phash63_from_pixels(pixels: np.ndarray) -> np.ndarray:
    """(B, 32, 32) integer pixel lumas (0..255) → (B,) int64 pHash —
    the full-resolution path for a real image codec.

    C @ X @ C^T as two chained matmuls for the same reason as
    phash63_from_cells: the un-optimized einsum is B·32⁴ int64 ops
    (measured 124 ms vs 14 ms for 1500 assets), the staged form
    B·2·32³, bit-identical (worst case |C·X| ≤ 32·2^20·255 ≈ 2^33,
    final ≤ 32·2^33·2^20 ≈ 2^58 < 2^63 — no overflow)."""
    c = c32_fixed()
    coef = c @ pixels.astype(np.int64) @ c.T
    return _pack_bits(coef)


_PHASH_UDF = None


def phash63(cells_col):
    """Column[array<bigint> of 64 row-major cell lumas] → Column[long].
    Arrow-batched: the whole batch becomes ONE (B, 8, 8) ndarray and two
    8×8 integer matmuls — no per-row Python. Built lazily (DDL-string
    return types need an active session)."""
    global _PHASH_UDF
    if _PHASH_UDF is None:

        @F.pandas_udf("long")
        def _udf(cells: pd.Series) -> pd.Series:
            if len(cells) == 0:
                return pd.Series([], dtype="int64")
            arr = np.array(cells.tolist(), dtype=np.int64).reshape(
                len(cells), N_CELL, N_CELL
            )
            return pd.Series(phash63_from_cells(arr), index=cells.index)

        _PHASH_UDF = _udf
    return _PHASH_UDF(cells_col)


_IMAGE_PHASH_UDF = None


def image_phash63(payload_col):
    """Column[binary image payload, any natively-decodable format] →
    Column[long pHash]: format-sniffing decode (PNG signature / P6 PPM
    magic, ``codecs.decode_image``) → exact box-mean resize →
    fixed-point DCT hash. The per-image decode is a header parse + one
    frombuffer (+ one zlib inflate for PNG); the DCT runs batched over
    the stacked (B, 32, 32) array. Shared by the batch mixed-format
    query and the streaming pHash ingest filter."""
    global _IMAGE_PHASH_UDF
    if _IMAGE_PHASH_UDF is None:
        from .codecs import decode_image, luma_resize_32

        @F.pandas_udf("long")
        def _udf(payload: pd.Series) -> pd.Series:
            if len(payload) == 0:
                return pd.Series([], dtype="int64")
            pixels = np.stack(
                [luma_resize_32(decode_image(bytes(p))) for p in payload]
            )
            return pd.Series(
                phash63_from_pixels(pixels), index=payload.index
            )

        _IMAGE_PHASH_UDF = _udf
    return _IMAGE_PHASH_UDF(payload_col)


def synthetic_cells(text_col) -> list:
    """The deterministic synthetic decode, Spark side: 64 JVM-computed
    cell lumas (row-major), cell c = first md5 byte of the payload
    chunk at proportional offset c/64 — the resize-step analog: equal
    content rasterizes equally regardless of payload length sharding.
    Returns the list of 64 Column expressions (callers array() them)."""
    n = F.length(text_col)
    n_cells = N_CELL * N_CELL
    cells = []
    for c in range(n_cells):
        start = (F.floor(F.lit(c) * n / n_cells) + 1).cast("int")
        blen = F.greatest(F.floor(n / n_cells), F.lit(1)).cast("int")
        chunk = text_col.substr(start, blen)
        cells.append(
            F.conv(F.substring(F.md5(chunk.cast("binary")), 1, 2), 16, 10)
            .cast("long")
        )
    return cells


def synthetic_cells_sql(expr: str) -> str:
    """DuckDB fragment: (u, v, luma) rows of the same synthetic decode —
    one row per cell via generate_series, byte-identical to
    :func:`synthetic_cells` for ASCII payloads."""
    n_cells = N_CELL * N_CELL
    return f"""
      SELECT media_id, CAST(cu.i AS INTEGER) AS u, CAST(cv.i AS INTEGER) AS v,
             CAST(concat('0x', substr(md5(substr(payload,
               CAST(floor((cu.i * {N_CELL} + cv.i) * length(payload)
                    / {n_cells}.0) + 1 AS BIGINT),
               greatest(CAST(floor(length(payload) / {n_cells}.0) AS BIGINT),
                        1))), 1, 2)) AS BIGINT) AS luma
      FROM payloads,
           unnest(generate_series(0, {N_CELL - 1})) AS cu(i),
           unnest(generate_series(0, {N_CELL - 1})) AS cv(i)
    """


def cell_basis_sql_values() -> str:
    """The fixed-point cell basis as a SQL VALUES list ``(p, u, c)`` —
    the SAME integers cell_basis_fixed() computes, so the oracle's DCT
    is the Spark DCT."""
    b = cell_basis_fixed()
    rows = ", ".join(
        f"({p}, {u}, {int(b[p, u])})"
        for p in range(N_CELL)
        for u in range(N_CELL)
    )
    return f"(VALUES {rows}) AS bmat(p, u, c)"


def phash63_sql() -> str:
    """DuckDB fragment computing ``ph(media_id, h)`` from a ``cells``
    CTE (media_id, u, v, luma): integer DCT via two joins against the
    literal basis, median via the 32nd-smallest order statistic, 63-bit
    pack. Exact-integer throughout — see module docstring."""
    return f"""
    coef AS (
      SELECT cells.media_id, bi.p AS p, bj.p AS q,
             sum(cells.luma * bi.c * bj.c) AS d
      FROM cells
      JOIN {cell_basis_sql_values().replace('bmat', 'bi', 1)} ON bi.u = cells.u
      JOIN {cell_basis_sql_values().replace('bmat', 'bj', 1)} ON bj.u = cells.v
      GROUP BY cells.media_id, bi.p, bj.p
    ), ranked AS (
      SELECT media_id, p, q, d,
             row_number() OVER (PARTITION BY media_id ORDER BY d, p, q) AS rn
      FROM coef WHERE NOT (p = 0 AND q = 0)
    ), med AS (
      SELECT media_id, d AS med FROM ranked WHERE rn = {N_BITS // 2 + 1}
    ), ph AS (
      SELECT c.media_id,
             CAST(sum(CASE WHEN c.d > m.med
                      THEN CAST(1 AS BIGINT) << (c.p * 8 + c.q - 1)
                      ELSE 0 END) AS BIGINT) AS h
      FROM coef c JOIN med m ON c.media_id = m.media_id
      WHERE NOT (c.p = 0 AND c.q = 0)
      GROUP BY c.media_id
    )
    """
