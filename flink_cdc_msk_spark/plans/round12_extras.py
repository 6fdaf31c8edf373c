"""Round-12 additions.

* ``multimodal_phash_real_decode`` — the pHash near-dup pipeline with a
  REAL image decode in the loop (VERDICT r11 item 4): each asset's
  synthetic 8x8 cell raster is encoded as an actual P6 PPM binary
  payload (header + raw RGB bytes — the media-lake column shape), and
  the hash side treats that payload as opaque: parse the header, decode
  the raster, BT.601 luma, box-mean resize to 32x32, full-resolution
  fixed-point DCT (``phash63_from_pixels``). No step sees the original
  cells. Half the assets encode at 32x32 (scale 4), half at 64x64
  (scale 8) so the resize path is genuinely exercised. Because the PPM
  roundtrip is pixel-lossless, grayscale luma is exact (R=G=B), the
  box-mean of block-constant rasters is exact, and the phash module's
  cells/pixels identity is exact, the resulting hashes are BIT-IDENTICAL
  to the synthetic path's — so this query shares ``PHASH_ORACLE``
  VERBATIM (the streaming-twin oracle-sharing rule), and a driver-green
  row certifies the real decode end-to-end against DuckDB.

Reference parity note: the reference repo (yhyyz/flink-cdc-msk) has no
data-curation surface — Part-B capability closure, LLM-pipeline rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.codecs import decode_ppm, encode_ppm, luma_resize_32
from ..functions.phash import N_CELL, phash63_from_pixels, synthetic_cells
from .registry import register
from .round8_extras import (
    PHASH_ORACLE,
    _docs_with_dups,
    phash_band_pairs,
)

_PPM_ENCODE_UDF = None
_PPM_PHASH_UDF = None


def ppm_encode(cells_col, scale_col):
    """Column[array<bigint> of 64 cell lumas], Column[int scale] →
    Column[binary]: a real P6 PPM payload, each cell upsampled to a
    scale x scale constant block (raster size 8·scale square). Lazy
    build — DDL-string return types need an active session."""
    global _PPM_ENCODE_UDF
    if _PPM_ENCODE_UDF is None:

        @F.pandas_udf("binary")
        def _udf(cells: pd.Series, scale: pd.Series) -> pd.Series:
            out = []
            for cs, sc in zip(cells, scale):
                grid = (
                    np.asarray(cs, dtype=np.int64)
                    .reshape(N_CELL, N_CELL)
                    .astype(np.uint8)
                )
                img = np.repeat(np.repeat(grid, sc, axis=0), sc, axis=1)
                out.append(encode_ppm(img))
            return pd.Series(out, index=cells.index, dtype=object)

        _PPM_ENCODE_UDF = _udf
    return _PPM_ENCODE_UDF(cells_col, scale_col)


def ppm_phash(payload_col):
    """Column[binary PPM payload] → Column[long pHash] through the REAL
    pixel path: decode_ppm → luma_resize_32 → phash63_from_pixels. The
    per-image decode is a header parse + one frombuffer (no per-pixel
    Python); the DCT runs batched over the stacked (B, 32, 32) array."""
    global _PPM_PHASH_UDF
    if _PPM_PHASH_UDF is None:

        @F.pandas_udf("long")
        def _udf(payload: pd.Series) -> pd.Series:
            if len(payload) == 0:
                return pd.Series([], dtype="int64")
            pixels = np.stack(
                [
                    luma_resize_32(decode_ppm(bytes(p)))
                    for p in payload
                ]
            )
            return pd.Series(
                phash63_from_pixels(pixels), index=payload.index
            )

        _PPM_PHASH_UDF = _udf
    return _PPM_PHASH_UDF(payload_col)


@register("multimodal_phash_real_decode", oracle=PHASH_ORACLE)
def multimodal_phash_real_decode(spark, sf_dir):
    """pHash near-dup with a REAL image decode in the loop — see module
    docstring for the exactness chain that lets it share the synthetic
    path's DuckDB oracle verbatim. Plan shape: cells are JVM-computed
    (synthetic_cells), one Arrow stage encodes PPM payloads, one Arrow
    stage decodes+hashes (the media-lake read analog — at 100 TB the
    encode stage is replaced by the parquet binary-column scan and the
    decode stage is unchanged), then the shared banding tail: one
    shuffle on (band, band_v), lowest-matching-band exactly-once
    emission, no all-pairs stage anywhere."""
    corpus = _docs_with_dups(spark, sf_dir)
    media = corpus.select(
        F.col("doc_id").alias("media_id"),
        ppm_encode(
            F.array(*synthetic_cells(F.col("text"))),
            ((F.col("doc_id") % 2) * 4 + 4).cast("int"),
        ).alias("payload"),
    )
    ph = media.select("media_id", ppm_phash(F.col("payload")).alias("h"))
    return phash_band_pairs(spark, ph, (sf_dir, "real_decode"))
