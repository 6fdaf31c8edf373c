"""Deterministic k-means (Lloyd's algorithm) over embedding columns.

An iterative algorithm the SQL surface can't express in one query — but
each Lloyd round IS relational (distance join → argmin → centroid
re-aggregation), so the operator unrolls a fixed number of rounds into
one DataFrame plan. Everything is engineered to be bit-reproducible
across engines and partitionings:

  * init: the k vectors with the smallest ids (no RNG);
  * distances accumulate as DECIMAL(28,14) — exact addition, so the
    per-(vector, centroid) distance is partition-order independent;
  * centroid means sum DECIMAL(24,12) then divide as DOUBLE — one
    deterministic rounding per (cluster, dim);
  * argmin tie-breaks on the cluster index via an explicit
    (dist, cluster) ordering.

Relationship to ``operators/similarity.py::kmeans_centroids``: that one
is IVF's internal coarse quantizer (cosine assignment, float ``avg``
centroids — fast, but partition-order float sums make it
reproducible-in-practice, not provably); this one is the user-facing
clustering operator, engineered for exact cross-engine reproducibility
so it can carry a DuckDB oracle.

Scale shape: the element relation is n·d rows; each round shuffles it
once against a k·d broadcast and once on the vector id (n·k distance
rows). For production-size corpora the assignment step would swap to
the blocked-BLAS ``mapInPandas`` kernel `operators/similarity.py` uses
for `embedding_near_dup` (same plumbing, ~d× less shuffle weight) at
the cost of float-associativity reproducibility; this form is the
exact, oracle-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kmeans_assign(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, cluster) after ``iters`` Lloyd rounds from deterministic
    init (centroids = the ``k`` smallest-id vectors)."""
    elems = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    cent = elems.filter(F.col("id") < k).select(
        F.col("id").cast("int").alias("cl"),
        "pos",
        F.col("val").alias("cval"),
    )
    assign = None
    for it in range(iters):
        dist = (
            elems.join(F.broadcast(cent), "pos")
            .groupBy("id", "cl")
            .agg(
                F.sum(
                    (
                        (F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval"))
                    ).cast("decimal(28,14)")
                ).alias("dist")
            )
        )
        rn = F.row_number().over(
            Window.partitionBy("id").orderBy("dist", "cl")
        )
        assign = (
            dist.withColumn("rn", rn).filter(F.col("rn") == 1)
            .select("id", "cl")
        )
        if it < iters - 1:
            cent = (
                elems.join(assign, "id")
                .groupBy("cl", "pos")
                .agg(
                    (
                        F.sum(F.col("val").cast("decimal(24,12)")).cast(
                            "double"
                        )
                        / F.count(F.lit(1))
                    ).alias("cval")
                )
            )
    return assign
