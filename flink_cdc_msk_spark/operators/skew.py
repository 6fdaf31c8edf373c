"""Skew-mitigation join helpers (100 TB concern; SURVEY.md Part B joins row).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
session.py) handles most runtime skew. Manual salting remains necessary
when one side has a pathological hot key AND the other side is too big to
broadcast — the classic CDC case: billions of change events for one hot
(db, table, pk) joined against a large dimension.

``salted_join`` spreads the skewed side's hot keys over ``salts``
sub-partitions (deterministic row hash — no RNG, stable under retries) and
replicates the other side once per salt, turning one giant shuffle
partition into ``salts`` even ones at the cost of replicating the smaller
side ``salts``×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with salt-spread hot keys.

    The skewed side gets ``_salt = xxhash64(whole row) % salts`` (rows with
    the same join key but different payloads scatter across salts); the
    other side is replicated via a constant sequence explode. Join keys
    become ``on + [_salt]`` — same result set as the plain join for
    inner/left joins (every skewed row still meets every matching other
    row exactly once, because the other side carries all salt values).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins (right/full would need "
            "the salt on the other side's null-extension)"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts)
    ).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return left.join(right, on + ["_salt"], how).drop("_salt")
