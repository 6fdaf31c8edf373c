"""Multimodal column plumbing (SURVEY.md Part B / north-star row).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The container has no image/audio
libraries, so the actual codec step is STUBBED (clearly marked): a real
deployment drops PIL/ffmpeg into ``_decode_real``; everything around it —
schema, batch shape, partitioning, UDF signatures — is real and tested.

Design for 100 TB: binary payloads never shuffle (all stages are map-only);
feature extraction emits small fixed-width rows so downstream aggs shuffle
features, not media bytes. Partition sizing is the reader's job
(``spark.sql.files.maxPartitionBytes``) since one row can be megabytes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video | text
        StructField("format", StringType()),  # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),  # -1 when n/a
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # -1 when n/a
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, byte_len long, sha1 string, "
    "mean_byte double, feature_dim int"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents table: payload =
    utf-8 bytes of the text, metadata derived from doc fields. Stands in
    for a real media lake scan (parquet/webdataset with binary columns)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("bin").alias("format"),
        (F.col("doc_id") % 640).cast("int").alias("width"),
        (F.col("doc_id") % 480).cast("int").alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _decode_real(payload: bytes, fmt: str):
    """Real codec hook. Raw rasters (PPM) decode in pure numpy and PNG
    — a genuinely COMPRESSED format — decodes in stdlib zlib + numpy
    (functions/codecs.py: chunk walk, CRC check, inflate, all five
    scanline filters); both return the uint8 luma plane. WAV PCM16
    likewise. Only entropy coders the stdlib lacks (JPEG/MP3/MP4/...)
    stay behind the declared NotImplementedError."""
    if fmt in ("ppm", "P6"):
        from ..functions.codecs import decode_ppm

        return decode_ppm(payload)
    if fmt == "png":
        from ..functions.codecs import decode_png

        return decode_png(payload)
    if fmt in ("wav", "riff"):
        from ..functions.codecs import decode_wav

        return decode_wav(payload)
    raise NotImplementedError(
        f"no entropy decoder for format {fmt!r} in this container; "
        "install PIL/soundfile for JPEG/MP3/... — PPM, PNG (zlib) and "
        "WAV decode natively (functions/codecs.py)"
    )


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Map-only feature extraction over binary payloads.

    STUB features (deterministic, codec-free): byte length, sha1, mean
    byte value — shaped exactly like a real embed/decode stage (fixed-width
    row per asset, Arrow batches in, no shuffle)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            if use_real_codec:
                for p, f in zip(payloads, pdf["format"]):
                    _decode_real(p, f)  # raises: stub
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "byte_len": [len(p) for p in payloads],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
                    "mean_byte": [
                        round(float(np.frombuffer(p, np.uint8).mean()), 6)
                        if p
                        else 0.0
                        for p in payloads
                    ],
                    "feature_dim": 3,
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, payload binary"
)


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    use_real_codec: bool = False,
) -> DataFrame:
    """Map-only 'resize' over binary payloads (the thumbnail/downsample
    stage of a multimodal training pipeline).

    STUB transform (deterministic, codec-free): output payload is the
    input bytes striped down to exactly ``width*height`` bytes (repeat-pad
    short inputs) — shaped exactly like a real resize (fixed-size output
    per asset, Arrow batches, no shuffle); a real deployment decodes via
    ``_decode_real`` and re-encodes with PIL/ffmpeg."""

    def gen(batches):
        import pandas as pd

        n = width * height
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for p, fmt in zip(pdf["payload"], pdf["format"]):
                b = bytes(p)
                if use_real_codec:
                    _decode_real(b, fmt)  # raises: stub
                reps = (n // max(len(b), 1)) + 1
                out.append((b * reps)[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.mapInPandas(gen, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 256, frame_len: int = 16) -> DataFrame:
    """'Frame sampling' plumbing: slice fixed-length windows out of each
    payload every N bytes (stand-in for video frame extraction). Pure
    Catalyst (substring on binary via sequence/transform) — one output row
    per frame, exploded map-side."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(
                F.col("payload").cast("string"),
                (i * every_n_bytes + 1).cast("int"),
                frame_len,
            ).alias("frame"),
        ),
    )
    # explode_outer: plain explode would infer a size(frames)>0 filter that
    # re-slices the whole payload; n_frames >= 1 so the array is never empty
    return media.select(
        "media_id", "kind", F.explode_outer(frames).alias("f")
    ).select("media_id", "kind", F.col("f.frame_no").alias("frame_no"),
             F.col("f.frame").alias("frame"))
