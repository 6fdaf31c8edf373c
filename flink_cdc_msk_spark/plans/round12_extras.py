"""Round-12 additions.

* ``multimodal_audio_stats`` — audio feature extraction with a REAL
  WAV decode in the loop: each doc synthesizes a deterministic PCM16
  payload (md5-block samples — the audio analog of the pHash cell
  rasterizer), and the stats side treats it as opaque RIFF bytes:
  chunk-walk the header, frombuffer the samples, compute exact-integer
  features (sum of squares, zero crossings, peak). The oracle re-derives
  the same samples from the same md5 formula in SQL, so every column is
  hash-exact by construction.
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


_MIXED_ENCODE_UDF = None


def mixed_encode(cells_col, id_col):
    """Column[array<bigint> 64 cell lumas], Column[long id] →
    Column[binary]: a REAL image payload whose format depends on the
    id — the mixed-format media-lake column shape. Even ids encode P6
    PPM at scale 4; odd ids encode PNG at scale 8 (32→64 px, so the
    box-mean resize runs), grayscale or truecolor alternating on
    id % 4, with per-scanline forward filter ``row % 5`` so EVERY
    unfilter branch of the decoder (None/Sub/Up/Average/Paeth)
    executes inside the registered query."""
    global _MIXED_ENCODE_UDF
    if _MIXED_ENCODE_UDF is None:
        from ..functions.codecs import encode_png

        @F.pandas_udf("binary")
        def _udf(cells: pd.Series, ids: pd.Series) -> pd.Series:
            out = []
            for cs, i in zip(cells, ids):
                grid = (
                    np.asarray(cs, dtype=np.int64)
                    .reshape(N_CELL, N_CELL)
                    .astype(np.uint8)
                )
                if int(i) % 2 == 0:
                    img = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
                    out.append(encode_ppm(img))
                else:
                    img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                    out.append(
                        encode_png(
                            img,
                            rgb=(int(i) % 4 == 3),
                            row_filters=[y % 5 for y in range(64)],
                        )
                    )
            return pd.Series(out, index=cells.index, dtype=object)

        _MIXED_ENCODE_UDF = _udf
    return _MIXED_ENCODE_UDF(cells_col, id_col)


def image_phash(payload_col):
    """Column[binary image payload, ANY supported format] → Column[long
    pHash]: format-sniffing decode (PNG signature / P6 magic) →
    box-mean resize → fixed-point DCT hash. The production shape for a
    lake whose binary column mixes formats — near-dup detection must
    be format-invariant, and the exactness chain (lossless decode,
    exact luma, exact resize, integer DCT) makes it bit-invariant.
    Shared with the streaming ingest filter via functions/phash.py."""
    from ..functions.phash import image_phash63

    return image_phash63(payload_col)


@register("multimodal_phash_mixed_format", oracle=PHASH_ORACLE)
def multimodal_phash_mixed_format(spark, sf_dir):
    """Cross-FORMAT perceptual near-dup: the corpus encodes half its
    assets as P6 PPM and half as real zlib-compressed PNG (alternating
    grayscale/truecolor, every scanline filter type), then hashes all
    of them through one format-sniffing decode path. A near-dup pair
    whose members live in DIFFERENT formats is still found — the
    training-lake scenario where the same image circulates as both a
    PNG and a raw dump. Every decode is lossless and the luma/resize/
    DCT steps are exact integers, so the hashes are bit-identical to
    the synthetic path's and the query shares PHASH_ORACLE verbatim —
    a driver-green row certifies the PNG inflate+unfilter end-to-end
    against DuckDB. Plan: JVM cells → Arrow encode → Arrow decode+hash
    (map-only; at 100 TB the encode stage is the lake scan) → shared
    banding tail, one shuffle, exactly-once emission."""
    corpus = _docs_with_dups(spark, sf_dir)
    media = corpus.select(
        F.col("doc_id").alias("media_id"),
        mixed_encode(
            F.array(*synthetic_cells(F.col("text"))), F.col("doc_id")
        ).alias("payload"),
    )
    ph = media.select("media_id", image_phash(F.col("payload")).alias("h"))
    return phash_band_pairs(spark, ph, (sf_dir, "mixed_format"))


# ---------------------------------------------------------------------------
# Streaming pHash ingest: perceptual image dedup with unbounded lookback
# ---------------------------------------------------------------------------

_PHI_SLABS = 4


def _phash_ingest_oracle() -> str:
    """Unrolled replay of the pHash filter's admission semantics. Unlike
    the text/vector ingest oracles this replay is EXACT operator
    semantics, not an LSH-candidate approximation: 7 bands pigeonhole-
    guarantee recall at hamming ≤ PHASH_HAM_MAX, so banded-candidates +
    hamming verify equals the full hamming-≤-max pair set, which is what
    the pairs CTE computes."""
    from ..functions.phash import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_HAM_MAX,
        phash63_sql,
        synthetic_cells_sql,
    )
    from .round8_extras import DOCS_WITH_DUPS_SQL

    mask = (1 << PHASH_BAND_BITS) - 1
    rounds = ["a0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE false)"]
    for k in range(1, _PHI_SLABS + 1):
        rounds.append(f"""
    surv{k} AS MATERIALIZED (
      SELECT s.id FROM slabs s WHERE s.slab = {k} AND NOT EXISTS (
        SELECT 1 FROM pairs p JOIN a{k - 1} a
          ON (p.id1 = s.id AND p.id2 = a.id)
          OR (p.id2 = s.id AND p.id1 = a.id))
    ),
    adm{k} AS (
      SELECT x.id FROM surv{k} x WHERE NOT EXISTS (
        SELECT 1 FROM pairs p JOIN surv{k} y ON p.id1 = y.id
        WHERE p.id2 = x.id)
    ),
    a{k} AS MATERIALIZED (
      SELECT id FROM a{k - 1} UNION ALL SELECT id FROM adm{k})""")
    return f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), payloads AS (
      SELECT doc_id AS media_id, text AS payload FROM corpus
    ), cells AS (
      {synthetic_cells_sql("payload")}
    ), {phash63_sql()}, bands AS (
      SELECT media_id, h, CAST(b.i AS INTEGER) AS band,
             (h >> ({PHASH_BAND_BITS} * b.i)) & {mask} AS band_v
      FROM ph, unnest(generate_series(0, {PHASH_BANDS - 1})) AS b(i)
    ), pairs AS (
      SELECT DISTINCT a.media_id AS id1, b.media_id AS id2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_v = b.band_v
       AND a.media_id < b.media_id
      WHERE bit_count(xor(a.h, b.h)) <= {PHASH_HAM_MAX}
    ), slabs AS (
      SELECT media_id AS id,
             ntile({_PHI_SLABS}) OVER (ORDER BY media_id) AS slab
      FROM ph
    ),
    {','.join(rounds)}
    SELECT id AS media_id FROM a{_PHI_SLABS}
    """


@register("streaming_phash_neardup_ingest", oracle=_phash_ingest_oracle())
def streaming_phash_neardup_ingest(spark, sf_dir):
    """The cross-batch streaming near-dup filter for MEDIA — the
    perceptual-image member completing the streaming ingest family
    (text/minhash, vector/LSH, substring/tile, media/pHash): each
    micro-batch arrives as REAL image payloads (mixed PPM + PNG, the
    format-sniffing decode running inside the filter), hashes them in
    one Arrow stage, band-joins against the persistent store of every
    previously admitted asset's bands (unbounded lookback), verifies
    candidates with a codegen'd hamming compare on the join row (bands
    carry the full hash — no sidecar), dedups within the batch, and
    appends the survivors. The corpus replays as 4 media_id-ordered
    slabs (forced mtimes ⇒ deterministic batch order, ≥2 batches
    asserted). Because banding guarantees recall at the admitted
    hamming radius, the oracle's replay is EXACT operator semantics —
    a green row certifies the real decode, the banded store join, and
    the cross-batch admission machinery end-to-end against DuckDB."""
    import glob as _glob
    import os

    from ..streaming.dedup_stream import (
        StreamingPhashNearDupFilter,
        start_near_dup_stream,
    )
    from ..streaming.materialize import await_or_raise, session_tmpdir
    from pyspark.sql.window import Window

    corpus = _docs_with_dups(spark, sf_dir)
    media = corpus.select(
        F.col("doc_id").alias("media_id"),
        mixed_encode(
            F.array(*synthetic_cells(F.col("text"))), F.col("doc_id")
        ).alias("payload"),
    )
    d = session_tmpdir("phash_neardup_ingest_")
    src = f"{d}/src"
    # r12: materialize the encoded+slabbed corpus ONCE before the four
    # slab writes — each write otherwise re-derives the whole relation
    # (docs scan → PNG/PPM encode → global ntile window) and throws 3/4
    # away, with the tail single-task under coalesce(1): 16.5 s of the
    # query's 48 s went to these four setup writes (event-log stages
    # 10/12/14/16: 7.0+3.3+3.0+3.2 s, 1 task each). The checkpoint pays
    # the encode once; the writes become plain row pushes. Same rows,
    # same window order → byte-identical slab files.
    # bound: one copy of the encoded fixture media (|corpus| rows),
    # fixture setup only.
    slabbed = media.withColumn(
        "slab", F.ntile(_PHI_SLABS).over(Window.orderBy("media_id"))
    ).localCheckpoint(eager=True)
    for s in range(1, _PHI_SLABS + 1):
        (
            slabbed.filter(F.col("slab") == s)
            .drop("slab")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/s{s:02d}")
        )
    base = os.stat(src).st_mtime
    for s in range(1, _PHI_SLABS + 1):
        for f in _glob.glob(f"{src}/s{s:02d}/part-*.parquet"):
            os.utime(f, (base + s, base + s))
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/s*")
    )
    filt = StreamingPhashNearDupFilter(f"{d}/store", f"{d}/out")
    q = start_near_dup_stream(stream, filt, f"{d}/ckpt", available_now=True)
    await_or_raise(q, 300)
    n_batches = len(_glob.glob(f"{d}/store/batch_id=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental ingest, got {n_batches} batches"
        )
    return spark.read.parquet(f"{d}/out").select("media_id")


# ---------------------------------------------------------------------------
# Audio: real WAV decode -> exact-integer feature extraction
# ---------------------------------------------------------------------------

WAV_BLOCKS_BASE = 8  # md5 blocks per asset: 8 + (doc_id % 4) * 4
# -> 64..160 int16 samples (each md5 digest yields 8 two-byte samples)

AUDIO_ORACLE = f"""
    WITH blocks AS (
      SELECT d.doc_id AS media_id, d.text, b.i AS blk
      FROM documents d,
           unnest(generate_series(0,
             {WAV_BLOCKS_BASE} + (d.doc_id % 4) * 4 - 1)) AS b(i)
    ), samples AS (
      SELECT media_id, blk * 8 + j.i AS k,
             CAST(concat('0x', substr(md5(text || ':' || blk),
                                      1 + 4 * j.i, 4)) AS BIGINT) AS u
      FROM blocks, unnest(generate_series(0, 7)) AS j(i)
    ), signed AS (
      SELECT media_id, k,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      FROM samples
    ), lagged AS (
      SELECT media_id, s,
             lag(s) OVER (PARTITION BY media_id ORDER BY k) AS prev
      FROM signed
    )
    SELECT media_id,
           CAST(count(*) AS INTEGER) AS n_samples,
           CAST(count(*) * 1000 / {16000} AS BIGINT) AS duration_ms,
           CAST(sum(s * s) AS BIGINT) AS sum_sq,
           CAST(sum(CASE WHEN s * prev < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(max(abs(s)) AS INTEGER) AS peak
    FROM lagged
    GROUP BY media_id
"""


def _wav_samples(doc_id: int, text: str) -> np.ndarray:
    """The synthesis formula, Python side — MUST mirror AUDIO_ORACLE's
    samples CTE: block b's 16-byte md5(text || ':' || b) digest is read
    as 8 big-endian two-byte unsigned samples, then two's-complemented
    to int16."""
    import hashlib

    nb = WAV_BLOCKS_BASE + (int(doc_id) % 4) * 4
    hx = "".join(
        hashlib.md5(f"{text}:{b}".encode()).hexdigest() for b in range(nb)
    )
    u = np.array(
        [int(hx[4 * j : 4 * j + 4], 16) for j in range(nb * 8)],
        dtype=np.int64,
    )
    return np.where(u >= 32768, u - 65536, u).astype(np.int16)


@register("multimodal_audio_stats", oracle=AUDIO_ORACLE)
def multimodal_audio_stats(spark, sf_dir):
    """Audio feature extraction through a REAL RIFF/WAVE decode: one
    Arrow stage synthesizes PCM16 payloads (the media-lake binary
    column analog — at 100 TB this stage is the parquet scan), one
    Arrow stage chunk-walks the RIFF header, frombuffers the samples,
    and emits exact-integer features: n_samples, duration_ms (from the
    DECODED rate), energy (sum of squares), zero crossings, peak.
    Map-only end to end — no shuffle anywhere; the features are
    fixed-width rows, so the plan is one scan -> two Arrow evals,
    embarrassingly parallel at any scale. All-integer features make
    the DuckDB oracle (same md5 sample formula in SQL) hash-exact."""
    from ..functions.codecs import decode_wav, encode_wav
    from ..sources.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")

    def encode_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].to_numpy(),
                    "payload": [
                        encode_wav(_wav_samples(d, t))
                        for d, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    def stats_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, s16 = decode_wav(bytes(p))
                s = s16.astype(np.int64)
                n = len(s)
                rows.append(
                    (
                        int(mid),
                        n,
                        n * 1000 // rate,
                        int((s * s).sum()),
                        int(((s[:-1] * s[1:]) < 0).sum()),
                        int(np.abs(s).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "duration_ms",
                    "sum_sq",
                    "zero_crossings",
                    "peak",
                ],
            )

    media = docs.mapInPandas(encode_gen, "media_id long, payload binary")
    return media.mapInPandas(
        stats_gen,
        "media_id long, n_samples int, duration_ms long, sum_sq long, "
        "zero_crossings long, peak int",
    )


# ---------------------------------------------------------------------------
# Video: sampled-frame pHash near-dup (frame-majority verify)
# ---------------------------------------------------------------------------

VID_FRAME_BASE = 4  # frames per video: 4 + media_id % 3 (4..6)
VID_FRAME_MOD = 3
VID_STRIDE = 2  # sample every 2nd frame -> 2-3 sampled frames
VID_ROT_STEP = 7  # frame f's payload = text rotated by 7*f chars
VID_PACK = 16  # oracle-only (media_id, frame) key packing; frames < 16
VID_MIN_COMMON = 2

_VIDEO_SIG_MEMO: dict = {}


def _video_oracle() -> str:
    from ..functions.phash import (
        PHASH_HAM_MAX,
        phash63_sql,
        synthetic_cells_sql,
    )
    from .round8_extras import DOCS_WITH_DUPS_SQL

    return f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), vids AS (
      SELECT doc_id AS media_id, text,
             {VID_FRAME_BASE} + doc_id % {VID_FRAME_MOD} AS n_frames
      FROM corpus
    ), payloads AS (
      SELECT media_id * {VID_PACK} + fr.i AS media_id,
             substr(text, CAST((fr.i * {VID_ROT_STEP})
                    % greatest(length(text), 1) AS BIGINT) + 1)
             || substr(text, 1, CAST((fr.i * {VID_ROT_STEP})
                    % greatest(length(text), 1) AS BIGINT)) AS payload
      FROM vids,
           unnest(generate_series(0, n_frames - 1, {VID_STRIDE})) AS fr(i)
    ), cells AS (
      {synthetic_cells_sql("payload")}
    ), {phash63_sql()}, vf AS (
      SELECT media_id // {VID_PACK} AS media_id,
             media_id % {VID_PACK} AS f, h
      FROM ph
    ), joined AS (
      SELECT a.media_id AS m1, b.media_id AS m2,
             CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS ham
      FROM vf a JOIN vf b ON a.f = b.f AND a.media_id < b.media_id
    )
    SELECT m1 AS media_id_1, m2 AS media_id_2,
           CAST(count(*) AS INTEGER) AS n_common,
           CAST(sum(CASE WHEN ham <= {PHASH_HAM_MAX} THEN 1 ELSE 0 END)
                AS INTEGER) AS n_matched
    FROM joined
    GROUP BY m1, m2
    HAVING count(*) >= {VID_MIN_COMMON}
       AND 4 * sum(CASE WHEN ham <= {PHASH_HAM_MAX} THEN 1 ELSE 0 END)
           >= 3 * count(*)
    """


def video_near_dup_pairs(sig_rel):
    """Frame-majority video near-dup from a signature relation
    ``(media_id, sig: array<struct<f:int, h:long>>)`` (sig sorted by
    sampled frame index). Candidates: band-join on (frame, 9-bit band
    value) — a pair surfaces when ANY common sampled frame shares a
    band. Verify + emission both run IN-ROW on the joined sig arrays
    (<= 3 structs each), zero extra shuffle and zero pair-distinct:

    * exactly-once: a pair may collide at many (frame, band) keys; it
      is kept only at its lexicographically LOWEST colliding (frame,
      band), decided from the sig arrays in the row — the §42 emission
      rule extended to a frame-major composite key;
    * frame-majority verify: n_matched = common sampled frames within
      hamming <= PHASH_HAM_MAX, admitted iff n_common >= 2 and
      4*n_matched >= 3*n_common (>= 75%, exact integer arithmetic).
      Any admitted pair has a matched frame, and a matched frame
      pigeonhole-shares a band, so banded-candidate recall at the
      admission threshold is GUARANTEED, not probabilistic — which is
      why the oracle can be pure verify semantics (all-pairs per
      frame) with no banding mirror.

    Scale shape: the only pair-volume work happens inside the band
    join's output iterator (codegen'd higher-order functions over
    <= 3x3 element arrays); what shuffles is videos x sampled-frames x
    7 bands fixed-width rows plus the <= 3-long sig payload. At 100 TB
    the sampled-frame signature IS the video's index entry — frame
    decode/hash cost is the lake scan, amortized exactly once."""
    from ..functions.phash import PHASH_BAND_BITS, PHASH_BANDS, PHASH_HAM_MAX

    mask = (1 << PHASH_BAND_BITS) - 1
    bands = (
        sig_rel.select("media_id", "sig", F.explode("sig").alias("fr"))
        .select(
            "media_id",
            "sig",
            F.col("fr.f").alias("f"),
            F.col("fr.h").alias("h"),
            F.explode(
                F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
            ).alias("band"),
        )
        .withColumn(
            "band_v",
            F.expr(f"shiftright(h, {PHASH_BAND_BITS} * band) & {mask}"),
        )
    )
    # merge-pinned like phash_band_pairs: corpus-scale both sides
    a = bands.alias("a").hint("merge")
    b = bands.alias("b").hint("merge")
    cand = a.join(
        b,
        (F.col("a.f") == F.col("b.f"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_v") == F.col("b.band_v"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.media_id").alias("media_id_1"),
        F.col("b.media_id").alias("media_id_2"),
        F.col("a.sig").alias("asig"),
        F.col("b.sig").alias("bsig"),
        F.col("a.f").alias("f0"),
        F.col("a.band").alias("band0"),
    )

    def beq(b_i: int) -> str:
        s = PHASH_BAND_BITS * b_i
        return (
            f"(shiftright(x.h, {s}) & {mask}) = "
            f"(shiftright(y.h, {s}) & {mask})"
        )

    earlier_terms = " OR ".join(
        f"((x.f < f0 OR {b_i} < band0) AND {beq(b_i)})"
        for b_i in range(PHASH_BANDS)
    )
    lowest = ~F.expr(
        "exists(asig, x -> x.f <= f0 AND exists(bsig, y -> y.f = x.f "
        f"AND ({earlier_terms})))"
    )
    n_common = F.expr(
        "size(filter(asig, x -> exists(bsig, y -> y.f = x.f)))"
    )
    n_matched = F.expr(
        "size(filter(asig, x -> exists(bsig, y -> y.f = x.f "
        f"AND bit_count(x.h ^ y.h) <= {PHASH_HAM_MAX})))"
    )
    return (
        cand.filter(lowest)
        .select(
            "media_id_1",
            "media_id_2",
            n_common.cast("int").alias("n_common"),
            n_matched.cast("int").alias("n_matched"),
        )
        .filter(
            (F.col("n_common") >= VID_MIN_COMMON)
            & (4 * F.col("n_matched") >= 3 * F.col("n_common"))
        )
    )


@register("multimodal_video_near_dup", oracle=_video_oracle())
def multimodal_video_near_dup(spark, sf_dir):
    """Video near-duplicate detection by SAMPLED-FRAME perceptual hash —
    the training-lake dedup pass for video: decode is per-frame, cost
    is bounded by the SAMPLING stride (every 2nd frame here), and two
    videos are duplicates when >= 75% of their common sampled frames
    match at hamming <= 6 of 63 — robust to a re-encode perturbing a
    frame or a trailing edit changing the tail.

    Each doc synthesizes a deterministic video: 4 + media_id % 3
    frames, frame f's raster = the pHash synthetic decode of the text
    ROTATED by 7f chars (frames differ like a pan; clones share every
    frame; variable frame counts exercise the common-frame alignment
    since a clone's id shifts its length). Per sampled frame: 64 JVM
    cell lumas -> one Arrow DCT batch (the phash.py path, bit-exact vs
    the oracle). Signatures (<= 3 (f, h) structs) group once per video,
    memoized; candidates/verify/emission in video_near_dup_pairs.

    The DuckDB oracle packs (video, frame) into one key to reuse the
    shared cells/DCT fragments verbatim, then runs PURE verify
    semantics (per-frame all-pairs + frame-majority HAVING) — valid
    because banded recall at the admission threshold is guaranteed
    (see video_near_dup_pairs)."""
    from ..functions.phash import phash63, synthetic_cells
    from ..sources.tables import memoized_relation

    def build_sigs():
        corpus = _docs_with_dups(spark, sf_dir)
        vids = corpus.select(
            F.col("doc_id").alias("media_id"),
            "text",
            (F.lit(VID_FRAME_BASE) + F.col("doc_id") % VID_FRAME_MOD)
            .cast("int")
            .alias("n_frames"),
        )
        frames = vids.select(
            "media_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(VID_STRIDE)
                )
            ).alias("f"),
        )
        off = (F.col("f") * VID_ROT_STEP) % F.greatest(
            F.length("text"), F.lit(1)
        )
        payload = F.concat(
            F.col("text").substr(off + 1, F.length("text") - off),
            F.col("text").substr(F.lit(1), off),
        )
        fr = frames.select(
            "media_id", F.col("f").cast("int").alias("f"),
            payload.alias("payload"),
        )
        ph = fr.select(
            "media_id",
            "f",
            phash63(F.array(*synthetic_cells(F.col("payload")))).alias(
                "h"
            ),
        )
        return ph.groupBy("media_id").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("f"), F.col("h")))
            ).alias("sig")
        )

    # bound: one row per video, sig <= 3 (int, long) structs — the
    # video index entry, ~1e-4 of the decoded corpus
    sig_rel = memoized_relation(
        _VIDEO_SIG_MEMO, spark, (sf_dir, "videosig"), build_sigs
    )
    return video_near_dup_pairs(sig_rel)


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (the CommonCrawl first stage)
# ---------------------------------------------------------------------------

# Messy-URL synthesis: documents carry no URL column, so each doc derives
# a deterministic crawl-style URL from (doc_id, source) with the noise a
# real frontier emits — scheme/host case, default ports, trailing slash,
# tracking params (utm_*/fbclid), param order, fragments. The
# canonicalizer NEVER sees the components: it parses the assembled
# string, exactly like production code fed a crawl log.
URL_SYNTH_DUCK = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
                ELSE 'Http' END
           || '://'
           || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END
           || '.example.com'
           || CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
                   ELSE '' END
           || '/item/' || CAST(doc_id % 40 AS VARCHAR)
           || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
           || '?'
           || CASE WHEN doc_id % 2 = 0
                   THEN 'a=' || CAST(doc_id % 3 AS VARCHAR)
                        || '&z=1&utm_source=feed'
                   ELSE 'z=1&a=' || CAST(doc_id % 3 AS VARCHAR) END
           || CASE WHEN doc_id % 3 = 0
                   THEN '&fbclid=' || CAST(doc_id AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END
           AS url
    FROM documents
"""

URL_DEDUP_ORACLE = f"""
    WITH urls AS (
      {URL_SYNTH_DUCK}
    ), nofrag AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM urls
    ), parts AS (
      SELECT doc_id,
             lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(u, '^[A-Za-z]+://', '') AS rest
      FROM nofrag
    ), split1 AS (
      SELECT doc_id, scheme,
             regexp_extract(rest, '^([^/?]+)', 1) AS hostport,
             substr(rest, length(regexp_extract(rest, '^([^/?]+)', 1)) + 1)
               AS pathq
      FROM parts
    ), split2 AS (
      SELECT doc_id, scheme,
             regexp_replace(
               lower(regexp_replace(hostport, ':[0-9]+$', '')),
               '^www\\.', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_extract(pathq, '^([^?]*)', 1) AS path,
             regexp_extract(pathq, '\\?(.*)$', 1) AS query
      FROM split1
    ), canon AS (
      SELECT doc_id,
             scheme || '://' || host
             || CASE WHEN port = '' THEN ''
                     WHEN scheme = 'http'  AND port = '80'  THEN ''
                     WHEN scheme = 'https' AND port = '443' THEN ''
                     ELSE ':' || port END
             || CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
                     ELSE regexp_replace(path, '/+$', '') END
             || CASE WHEN kept = '' THEN '' ELSE '?' || kept END
               AS canonical_url
      FROM (
        SELECT *,
               array_to_string(list_sort(list_filter(
                 string_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(
                   p, '^(utm_|fbclid=|gclid=|ref=)'))), '&') AS kept
        FROM split2
      )
    )
    SELECT canonical_url,
           min(doc_id) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM canon
    GROUP BY canonical_url
"""


@register("text_url_canonical_dedup", oracle=URL_DEDUP_ORACLE)
def text_url_canonical_dedup(spark, sf_dir):
    """URL-level dedup behind a real URL canonicalizer — the stage every
    web-scale curation pipeline (CommonCrawl/C4/RefinedWeb lineage) runs
    BEFORE any content-based dedup, because it removes recrawls of the
    same page for the price of a metadata shuffle, never touching text.

    Each doc synthesizes a deterministic messy crawl URL (case noise,
    default ports, trailing slashes, utm_*/fbclid tracking params,
    param order, fragments); the canonicalizer then treats that string
    as opaque input: lowercase scheme/host, strip ``www.``, strip the
    port only when it is the scheme's default (a non-default ``:80``
    under https SURVIVES), drop the fragment, strip trailing slashes
    (empty path canonicalizes to ``/``), drop tracking params, and sort
    the survivors. One row per canonical URL with the elected keeper
    (min doc_id) and the recrawl count.

    Scale shape: the scan reads (doc_id, source) ONLY — at 100 TB the
    text column is never decoded (column pruning; the URL relation is
    ~100 bytes/row). Canonicalization is pure codegen'd string
    expressions (regexp + higher-order filter/sort on short arrays —
    no UDF, no Python); the single shuffle is the groupBy on
    canonical_url, a high-cardinality key with no skew by construction
    (recrawl multiplicity is bounded by the synthesis moduli; in
    production by crawl frequency). Reference parity note: the
    reference repo (yhyyz/flink-cdc-msk) has no curation surface —
    Part-B LLM-pipeline row."""
    from ..sources.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source"
    )
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTPS"))
        .when(d % 3 == 1, F.lit("http"))
        .otherwise(F.lit("Http")),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com"),
        F.when(d % 4 == 0, F.lit(":443"))
        .when(d % 4 == 1, F.lit(":80"))
        .otherwise(F.lit("")),
        F.lit("/item/"),
        (d % 40).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("a="), (d % 3).cast("string"),
                F.lit("&z=1&utm_source=feed"),
            ),
        ).otherwise(
            F.concat(F.lit("z=1&a="), (d % 3).cast("string"))
        ),
        F.when(
            d % 3 == 0, F.concat(F.lit("&fbclid="), d.cast("string"))
        ).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    urls = docs.select("doc_id", url.alias("url"))
    # canonicalize FROM THE STRING — the components above are never
    # consulted (a shared bug between synthesis and canonicalization
    # cannot cancel: the oracle re-parses independently)
    nofrag = F.regexp_replace("url", r"#.*$", "")
    canon = (
        urls.withColumn("u", nofrag)
        .withColumn(
            "scheme", F.lower(F.regexp_extract("u", r"^([A-Za-z]+)://", 1))
        )
        .withColumn("rest", F.regexp_replace("u", r"^[A-Za-z]+://", ""))
        .withColumn("hostport", F.regexp_extract("rest", r"^([^/?]+)", 1))
        .withColumn(
            "pathq",
            F.expr("substr(rest, length(hostport) + 1)"),
        )
        .withColumn(
            "host",
            F.regexp_replace(
                F.lower(F.regexp_replace("hostport", r":[0-9]+$", "")),
                r"^www\.",
                "",
            ),
        )
        .withColumn("port", F.regexp_extract("hostport", r":([0-9]+)$", 1))
        .withColumn("path", F.regexp_extract("pathq", r"^([^?]*)", 1))
        .withColumn("query", F.regexp_extract("pathq", r"\?(.*)$", 1))
        .withColumn(
            "kept",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split("query", "&"),
                        lambda p: (p != "")
                        & ~p.rlike("^(utm_|fbclid=|gclid=|ref=)"),
                    )
                ),
                "&",
            ),
        )
        .withColumn(
            "canonical_url",
            F.concat(
                F.col("scheme"),
                F.lit("://"),
                F.col("host"),
                F.when(F.col("port") == "", F.lit(""))
                .when(
                    (F.col("scheme") == "http") & (F.col("port") == "80"),
                    F.lit(""),
                )
                .when(
                    (F.col("scheme") == "https")
                    & (F.col("port") == "443"),
                    F.lit(""),
                )
                .otherwise(F.concat(F.lit(":"), F.col("port"))),
                F.when(
                    F.regexp_replace("path", r"/+$", "") == "", F.lit("/")
                ).otherwise(F.regexp_replace("path", r"/+$", "")),
                F.when(F.col("kept") == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), F.col("kept"))
                ),
            ),
        )
    )
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )
