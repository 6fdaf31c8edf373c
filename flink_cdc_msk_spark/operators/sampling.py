"""Deterministic sampling / mixture weighting (LLM-pipeline surface).

Training-data pipelines need REPRODUCIBLE sampling: the same corpus +
config must select the same rows on any cluster, any partitioning, any
retry — which rules out RNG-based ``df.sample``/``sampleBy`` (seed is
per-partition, so results change with partitioning). Instead: a pure
arithmetic hash of the row id decides membership — map-side, no shuffle,
no RNG, and expressible identically in any engine (the DuckDB oracle runs
the same formula).

Hash: Knuth multiplicative — ``(id * 2654435761) mod 2^32`` — then a
percentile bucket ``mod 100``. Adequate spreading for sampling decisions;
NOT a cryptographic guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hashing


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.pmod(c * F.lit(KNUTH), F.lit(2**32)), F.lit(buckets)
    ).cast("int")


def hash_bucket_sql(expr: str, buckets: int = 100) -> str:
    """The identical formula for a DuckDB oracle."""
    return f"CAST((({expr} * {KNUTH}) % 4294967296) % {buckets} AS INTEGER)"


def hash_sample(
    df: DataFrame, pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ``pct``% of rows (by id bucket)."""
    return df.filter(hash_bucket(id_col) < pct)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting stage of
    corpus assembly (e.g. upweight rare languages, downsample crawl data).
    ``fractions`` maps stratum value → percent kept (0-100). Map-side
    only: one filter expression, no shuffle, reproducible everywhere."""
    pct: Column = F.lit(default_pct)
    for value, p in sorted(fractions.items()):
        pct = F.when(F.col(stratum_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(hash_bucket(id_col) < pct)


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: int = 7,
) -> DataFrame:
    """Add a deterministic ``split`` column ('train'/'val'/'test') from
    the salted id bucket. The salt decorrelates the split from any other
    hash_bucket-based sampling decision on the same ids; same formula,
    map-side, reproducible on any engine/partitioning/retry."""
    b = hash_bucket(F.col(id_col) + F.lit(salt))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def train_val_test_split_sql(expr: str, train_pct: int = 80,
                             val_pct: int = 10, salt: int = 7) -> str:
    """DuckDB oracle twin of :func:`train_val_test_split`'s split expr."""
    b = hash_bucket_sql(f"({expr} + {salt})")
    return (
        f"CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END"
    )


def weighted_sample_keys(
    id_col: str = "doc_id", weight_col: str = "n_chars"
) -> Column:
    """Efraimidis–Spirakis weighted-sampling key, deterministic form:
    ``ln(u)/w`` with u ∈ (0,1) derived from an md5 slice of the id
    (engine-portable, no RNG). Taking the top-n keys DESC draws a
    without-replacement sample where selection probability scales with
    the weight — the standard one-pass distributed weighted sampler.
    Rounded to 12 dp so a 1-ulp libm ln() difference between engines
    can never flip a ranking."""
    h = F.conv(
        F.substring(
            F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    return F.round(F.log(u) / F.col(weight_col), 12)


def weighted_sample_keys_sql(
    id_expr: str = "doc_id", weight_expr: str = "n_chars"
) -> str:
    """DuckDB oracle twin of :func:`weighted_sample_keys`."""
    h = (
        f"CAST(concat('0x', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT)"
    )
    return f"round(ln(({h} + 0.5) / 4294967296.0) / {weight_expr}, 12)"


def weighted_sample(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``n`` rows.
    ``orderBy().limit()`` compiles to TakeOrdered — per-partition top-n
    then a single n-row merge, never a global sort materialization."""
    return (
        df.withColumn("_wkey", weighted_sample_keys(id_col, weight_col))
        .orderBy(F.col("_wkey").desc(), F.col(id_col))
        .limit(n)
        .drop("_wkey")
    )
