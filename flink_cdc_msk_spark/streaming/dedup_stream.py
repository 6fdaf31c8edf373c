"""Cross-batch streaming near-duplicate filtering (LLM-pipeline × CDC).

``dropDuplicatesWithinWatermark`` handles EXACT keys inside a watermark
horizon. A training-data ingest needs more: NEAR-duplicate suppression
against everything already admitted, unbounded lookback. This module
implements it as a foreachBatch stage over a persistent MinHash signature
store:

  per micro-batch:
    1. signature the incoming docs (map-side MinHash, operators/dedup.py)
    2. band-join them against the stored signature table → candidates
    3. verify candidates with exact hashed-unit Jaccard
    4. batch-internal dedup the survivors the same way
    5. append admitted docs' signatures to the store; emit admitted docs

At scale the store is the natural bottleneck — it is read via its band
columns only (narrow projection) and grows by admitted docs only. The
band join is linear in batch×store collision count, never batch×store.

Verify state: admitted docs' hashed unit-sets are persisted as a sidecar
table (``<store_path>_sets``, one (id, toks) row per admitted doc) at the
same time as their band rows.  Step 3 joins candidates against that
sidecar directly — per-batch verify work is O(candidate pairs) plus a
columnar (id, toks) scan, NOT a re-tokenization (explode + groupBy over
every admitted doc's text) whose cost would grow with the corpus.  At
cluster scale the sidecar can additionally be bucketed by id so the
candidate join co-locates without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _unit_sets, minhash_signatures


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Scan of a state table, or None if it genuinely doesn't exist yet.
    Any other read failure re-raises — a partial/corrupt store must fail
    the batch (and be retried), not silently admit near-duplicates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            # only empty batch dirs so far (a batch can admit zero docs)
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return None
        raise


def _banded(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    rows = num_hashes // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"h{i}") for i in range(b * rows, (b + 1) * rows)]
        entries.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    return sigs.select(
        "id", F.explode_outer(F.array(*entries)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


class StreamingNearDupFilter:
    """foreachBatch target: admit only docs that are not near-dups of any
    previously admitted doc (or of an earlier doc in the same batch).

    ``store_path`` holds (id, band, bucket) rows of admitted docs and
    ``<store_path>_sets`` their hashed unit-sets (the verify state);
    ``out_path`` accumulates admitted (id, text) rows.
    """

    def __init__(
        self,
        store_path: str,
        out_path: str,
        threshold: float = 0.8,
        num_hashes: int = 32,
        bands: int = 8,
        ngram: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.store_path = store_path
        self.sets_path = store_path + "_sets"
        self.out_path = out_path
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.ngram = ngram
        self.text_col = text_col
        self.id_col = id_col

    def _jaccard_ok(self, pairs: DataFrame, sets1: DataFrame, sets2: DataFrame) -> DataFrame:
        """pairs(id1,id2) → those with jaccard >= threshold (near-dups).

        The ratio is rounded to 6 decimals before the compare so the
        admit/reject boundary is bit-identical to the batch operator
        (jaccard_pairs) and the DuckDB oracle, both of which round — an
        exact jaccard in [threshold - 5e-7, threshold) must classify the
        same way everywhere."""
        return (
            pairs.join(
                sets1.withColumnsRenamed({"id": "id1", "toks": "toks1"}), "id1"
            )
            .join(sets2.withColumnsRenamed({"id": "id2", "toks": "toks2"}), "id2")
            .filter(
                F.round(
                    F.size(F.array_intersect("toks1", "toks2"))
                    / F.size(F.array_union("toks1", "toks2")),
                    6,
                )
                >= self.threshold
            )
            .select("id1", "id2")
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select(self.id_col, self.text_col).cache()
        sigs = minhash_signatures(
            batch, self.num_hashes, self.text_col, self.id_col, self.ngram
        )
        banded = _banded(sigs, self.num_hashes, self.bands).cache()
        sets = _unit_sets(
            batch, self.text_col, self.id_col, self.ngram, hashed=True
        ).cache()

        # --- cross-batch: candidates vs the persistent store. Rows from
        # THIS batch_id are excluded: on a foreachBatch retry the store
        # already holds the failed attempt's output, and without the
        # exclusion every doc would match itself and be rejected.
        store = _read_or_none(spark, self.store_path)
        stored_sets = _read_or_none(spark, self.sets_path)
        if (store is None) != (stored_sets is None):
            # Half-present state (a pre-sidecar store, or one table lost)
            # must FAIL the batch — silently skipping the cross-batch
            # verify would admit near-duplicates, the exact failure mode
            # _read_or_none's contract forbids.
            raise ValueError(
                "inconsistent near-dup state: band store and unit-set "
                f"sidecar must both exist or both be absent "
                f"({self.store_path} vs {self.sets_path})"
            )
        if store is not None:
            store = store.filter(F.col("batch_id") != F.lit(batch_id))
        if stored_sets is not None:
            stored_sets = stored_sets.filter(
                F.col("batch_id") != F.lit(batch_id)
            )
        dup_vs_store = None
        if store is not None and stored_sets is not None:
            cand = (
                banded.alias("n")
                .join(
                    store.alias("s"),
                    (F.col("n.band") == F.col("s.band"))
                    & (F.col("n.bucket") == F.col("s.bucket")),
                )
                .select(F.col("n.id").alias("id1"), F.col("s.id").alias("id2"))
                .distinct()
            )
            # Verify against the PERSISTED unit-sets — the join touches
            # only candidate ids' rows, so per-batch verify work is
            # O(candidates), independent of how much has been admitted.
            # (Before round 5 this re-ran _unit_sets over every admitted
            # doc's text each batch — O(corpus) per batch, the one
            # 100 TB scale-killer the round-4 audit found.)
            dup_vs_store = self._jaccard_ok(
                cand, sets, stored_sets.select("id", "toks")
            ).select(F.col("id1").alias("id"))

        survivors = (
            batch.join(
                dup_vs_store,
                F.col(self.id_col) == dup_vs_store["id"],
                "left_anti",
            )
            if dup_vs_store is not None
            else batch
        )

        # --- batch-internal: keep the lowest id of each near-dup group
        sb = banded.join(
            survivors.select(F.col(self.id_col).alias("id")), "id"
        )
        internal = (
            sb.alias("x")
            .join(
                sb.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
            .distinct()
        )
        internal_dups = self._jaccard_ok(internal, sets, sets).select(
            F.col("id2").alias("id")  # the higher id of each pair drops
        ).distinct()
        admitted = survivors.join(
            internal_dups,
            F.col(self.id_col) == internal_dups["id"],
            "left_anti",
        ).cache()

        # --- persist: admitted docs + their band rows + their hashed
        # unit-sets (reuse the already-computed banded/sets frames — no
        # extra tokenization pass). Each batch owns a batch_id=
        # subdirectory written with overwrite semantics, so a RETRIED
        # batch replaces its own prior output instead of appending
        # duplicate docs/band/set rows (foreachBatch gives at-least-once
        # invocation; idempotent writes restore effective exactly-once).
        admitted.write.mode("overwrite").parquet(
            f"{self.out_path}/batch_id={batch_id}"
        )
        admitted_ids = admitted.select(F.col(self.id_col).alias("id"))
        banded.join(admitted_ids, "id").write.mode("overwrite").parquet(
            f"{self.store_path}/batch_id={batch_id}"
        )
        sets.join(admitted_ids, "id").write.mode("overwrite").parquet(
            f"{self.sets_path}/batch_id={batch_id}"
        )

        for df in (admitted, sets, banded, batch):
            df.unpersist()


class StreamingVectorNearDupFilter:
    """foreachBatch target: the EMBEDDING twin of StreamingNearDupFilter —
    admit only vectors that are not near-dups (cosine ≥ threshold) of any
    previously admitted vector, unbounded lookback.

    State: ``store_path`` holds (id, table, bucket) hyperplane-LSH rows
    of admitted vectors (portable md5-parity planes, so an external SQL
    engine re-derives the buckets); ``<store_path>_vecs`` holds their
    raw double vectors — the verify sidecar, read per candidate (the
    round-5 sidecar design, applied from day one: per-batch verify work
    is bounded by candidate rows, never by the admitted corpus).
    ``out_path`` accumulates admitted (id, vector) rows."""

    def __init__(
        self,
        store_path: str,
        out_path: str,
        threshold: float = 0.3,
        n_planes: int = 4,
        n_tables: int = 8,
        dims: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.store_path = store_path
        self.vecs_path = store_path + "_vecs"
        self.out_path = out_path
        self.threshold = threshold
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.dims = dims
        self.id_col = id_col
        self.vec_col = vec_col

    def _cos_ok(self, pairs: DataFrame, v1: DataFrame, v2: DataFrame) -> DataFrame:
        """pairs(id1,id2) → those with round(cosine,6) >= threshold.
        Rounded before the compare so the admit boundary is bit-identical
        to the batch operator (lsh_near_dup_pairs) and the oracle."""
        from ..operators.similarity import cosine

        return (
            pairs.join(v1.withColumnsRenamed({"id": "id1", "v": "v1"}), "id1")
            .join(v2.withColumnsRenamed({"id": "id2", "v": "v2"}), "id2")
            .filter(
                F.round(cosine(F.col("v1"), F.col("v2")), 6)
                >= self.threshold
            )
            .select("id1", "id2")
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import as_double, random_hyperplane_buckets

        spark = batch.sparkSession
        batch = batch.select(self.id_col, self.vec_col).cache()
        buckets = random_hyperplane_buckets(
            batch,
            self.n_planes,
            self.n_tables,
            self.id_col,
            self.vec_col,
            portable_dims=self.dims,
        ).cache()
        vecs = batch.select(
            F.col(self.id_col).alias("id"),
            as_double(self.vec_col).alias("v"),
        ).cache()

        store = _read_or_none(spark, self.store_path)
        stored_vecs = _read_or_none(spark, self.vecs_path)
        if (store is None) != (stored_vecs is None):
            raise ValueError(
                "inconsistent vector near-dup state: bucket store and "
                f"vector sidecar must both exist or both be absent "
                f"({self.store_path} vs {self.vecs_path})"
            )
        if store is not None:
            store = store.filter(F.col("batch_id") != F.lit(batch_id))
            stored_vecs = stored_vecs.filter(
                F.col("batch_id") != F.lit(batch_id)
            )
        dup_vs_store = None
        if store is not None:
            cand = (
                buckets.alias("n")
                .join(
                    store.alias("s"),
                    (F.col("n.table") == F.col("s.table"))
                    & (F.col("n.bucket") == F.col("s.bucket")),
                )
                .select(F.col("n.id").alias("id1"), F.col("s.id").alias("id2"))
                .distinct()
            )
            dup_vs_store = self._cos_ok(
                cand, vecs, stored_vecs.select("id", "v")
            ).select(F.col("id1").alias("id"))

        survivors = (
            batch.join(
                dup_vs_store,
                F.col(self.id_col) == dup_vs_store["id"],
                "left_anti",
            )
            if dup_vs_store is not None
            else batch
        )

        sb = buckets.join(
            survivors.select(F.col(self.id_col).alias("id")), "id"
        )
        internal = (
            sb.alias("x")
            .join(
                sb.alias("y"),
                (F.col("x.table") == F.col("y.table"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
            .distinct()
        )
        internal_dups = (
            self._cos_ok(internal, vecs, vecs)
            .select(F.col("id2").alias("id"))
            .distinct()
        )
        admitted = survivors.join(
            internal_dups,
            F.col(self.id_col) == internal_dups["id"],
            "left_anti",
        ).cache()

        admitted.write.mode("overwrite").parquet(
            f"{self.out_path}/batch_id={batch_id}"
        )
        admitted_ids = admitted.select(F.col(self.id_col).alias("id"))
        buckets.join(admitted_ids, "id").write.mode("overwrite").parquet(
            f"{self.store_path}/batch_id={batch_id}"
        )
        vecs.join(admitted_ids, "id").write.mode("overwrite").parquet(
            f"{self.vecs_path}/batch_id={batch_id}"
        )

        for df in (admitted, vecs, buckets, batch):
            df.unpersist()


def start_near_dup_stream(
    doc_stream: DataFrame,
    filt: StreamingNearDupFilter,
    checkpoint: str,
    available_now: bool = False,
):
    writer = (
        doc_stream.writeStream.foreachBatch(filt)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
