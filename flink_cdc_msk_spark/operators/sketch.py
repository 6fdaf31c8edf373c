"""Count-Min sketch as a relational operator (heavy-hitter estimation).

At 100 TB you cannot materialize the full token→count map to find heavy
hitters; a Count-Min sketch bounds the state at k·m counters while
guaranteeing ``true ≤ estimate ≤ true + N/m`` (w.h.p. over k rows). The
sketch here is a DATAFRAME of (row, bucket, c) — k·m rows regardless of
corpus size — built with one token explode + one bounded-key shuffle;
estimates come from a broadcast join of the probe tokens against the
sketch and a ``min`` over the k rows. Hash functions are the engine-
portable md5 8-hex slices (`dedup.bloom_bit_sql` family), so a DuckDB
oracle re-derives sketch AND estimates bit-for-bit — the CMS error
guarantee itself becomes a hash-checked fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(token_col, row: int, m: int):
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    return F.pmod(
        F.conv(
            F.substring(F.md5(c.cast("binary")), 1 + 8 * row, 8), 16, 10
        ).cast("long"),
        F.lit(m),
    )


def cms_bucket_sql(expr: str, row: int, m: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({expr}), {1 + 8 * row}, 8)) "
        f"AS BIGINT) % {m}"
    )


def cms_sketch(
    tokens: DataFrame, token_col: str = "token", k: int = 3, m: int = 1024
) -> DataFrame:
    """→ (row, bucket, c): the k×m counter table from a token stream.
    One explode to k rows per token, one shuffle on (row, bucket) —
    map-side combine collapses the stream to ≤ k·m rows per partition
    before it moves."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_bucket(token_col, r, m).alias("bucket"),
                )
                for r in range(k)
            ]
        )
    ).alias("rb")
    return (
        tokens.select(rows)
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    k: int = 3,
    m: int = 1024,
) -> DataFrame:
    """→ probes + ``est``: min over the k counter rows for each probe
    token. The sketch is ≤ k·m rows — always broadcastable."""
    lookups = probes.select(
        F.col(token_col),
        F.posexplode(
            F.array(*[_cms_bucket(token_col, r, m) for r in range(k)])
        ).alias("row", "bucket"),
    )
    return (
        lookups.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").alias("est"))
    )
