"""salted_join: result equivalence vs plain join on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_msk_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # 90% of rows share one hot key — the shape salting exists for
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    return big, dim


def _key(rows):
    return sorted((r.k, r.payload, r.dim_val) for r in rows)


def test_salted_inner_join_equivalence(spark, skewed_pair):
    big, dim = skewed_pair
    plain = big.join(dim, ["k"], "inner")
    salted = salted_join(big, dim, ["k"], "inner", salts=8)
    assert _key(salted.collect()) == _key(plain.collect())


def test_salted_left_join_equivalence(spark, skewed_pair):
    big, dim = skewed_pair
    plain = big.join(dim, ["k"], "left")
    salted = salted_join(big, dim, ["k"], "left", salts=4)
    assert _key(salted.collect()) == _key(plain.collect())


def test_salted_join_rejects_right(spark, skewed_pair):
    big, dim = skewed_pair
    with pytest.raises(ValueError):
        salted_join(big, dim, ["k"], "right")


def test_salt_actually_spreads_hot_key(spark, skewed_pair):
    big, _ = skewed_pair
    salts = (
        big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)),
        )
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8  # hot key occupies every salt bucket
