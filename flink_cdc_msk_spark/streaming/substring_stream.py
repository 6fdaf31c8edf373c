"""Cross-batch streaming SUBSTRING-level dedup (the third ingest twin).

`streaming_neardup_ingest` suppresses whole-document near-duplicates
(MinHash over shingle sets); this filter works one level finer: a doc is
rejected when too much of its TEXT — measured in aligned fixed-width
character tiles, the `text_substring_dedup` unit — already exists in the
admitted corpus. That is the streaming form of Lee-et-al-2022 substring
dedup: boilerplate-heavy arrivals (mirrors, quoted reposts, templated
pages) get dropped even when their shingle-set Jaccard against any ONE
admitted doc stays below the near-dup threshold, because their text is
assembled from many admitted documents' fragments.

  per micro-batch:
    1. tile the incoming docs (map-side explode, TILE chars per tile)
    2. semi-join batch tiles against the persistent TILE STORE of
       everything admitted → per-doc duplicated-tile count; reject docs
       with dup fraction >= tau (cross-batch step)
    3. batch-internal: a survivor is admitted unless >= tau of its tiles
       appear among LOWER-id survivors' tiles (the same greedy one-step
       closed form the near-dup twin uses — oracle-replayable, no
       convergence assumption)
    4. append admitted docs' tile rows; emit admitted docs

State: ``store_path/batch_id=N`` parquet of (id, tile) rows — one
column the cross-batch semi-join reads (columnar projection keeps the
scan narrow), one job per batch, batch_id-owned directories so a
foreachBatch RETRY overwrites its own prior output (effective
exactly-once, same discipline as dedup_stream.py). Rows from the
current batch_id are excluded at read so a retry can't match a doc
against itself.

Scale shape: the per-batch cost is ONE shuffle of (batch tiles +
matching store tiles) on the tile key — candidate volume is bounded by
actual tile overlap, never batch x store. The store grows by admitted
docs' tiles only (~n_chars/TILE rows per doc). At cluster scale, bucket
the store by ``pmod(xxhash64(tile), B)`` so the semi-join co-locates
without re-shuffling the store side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_stream import _read_or_none

TILE = 32  # must match plans/round8_extras.py text_substring_dedup


def _tile_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tile_no, tile) — one row per aligned TILE-char window,
    the last tile possibly short (same construction, and therefore the
    same matching unit, as text_substring_dedup).

    Empty docs are dropped BEFORE tiling: for length 0 the upper bound
    floor((n-1)/TILE) is -1 and Spark's sequence(0, -1) DESCENDS,
    fabricating two phantom empty-string tile rows per empty doc — the
    DuckDB oracle's generate_series(0, -1) yields zero rows, so the
    filter is what keeps the replay bit-identical (and stops empty docs
    spuriously matching each other's phantom tiles)."""
    n = F.length(text_col)
    return docs.filter(n > 0).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.floor((n - 1) / TILE).cast("bigint"),
            )
        ).alias("tile_no"),
        text_col,
    ).select(
        "id",
        "tile_no",
        F.substring(
            text_col, (F.col("tile_no") * TILE + 1).cast("int"), TILE
        ).alias("tile"),
    )


def _cdc_unit_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tile_no, tile) — content-defined chunks via the Rabin-Karp
    boundary fast path (round 10): the OFFSET-INVARIANT unit. An aligned
    tile store misses a passage re-arriving at a shifted offset (zero
    shared tiles by construction — the same gap text_substring_dedup_cdc
    closed for the batch operator); content-defined boundaries reproduce
    a copied passage's interior chunks at ANY offset, so the cross-batch
    semi-join catches it. Same output contract as _tile_rows (unit text
    in ``tile``), so every downstream step — store layout, semi-joins,
    fraction math, compaction — is unit-agnostic."""
    from ..plans.round9_extras import _cdc_chunks

    return _cdc_chunks(docs, text_col, id_col, boundary="rk").select(
        F.col("doc_id").alias("id"),
        F.col("chunk_no").cast("bigint").alias("tile_no"),
        F.col("chunk").alias("tile"),
    )


class StreamingSubstringDedupFilter:
    """foreachBatch target: admit only docs whose duplicated-unit
    fraction — against the admitted unit store, then against lower-id
    batch survivors — stays below ``tau``.

    ``unit`` selects the matching granularity: ``"tile"`` (aligned
    32-char windows — the text_substring_dedup unit; cheapest, misses
    offset-shifted copies) or ``"cdc"`` (Rabin-Karp content-defined
    chunks — offset-invariant, the text_substring_dedup_rk unit). The
    unit is a property of the STORE: the first batch stamps it into
    ``store_path/.unit`` and later constructions refuse a mismatch
    (mixed-unit stores would silently never match).

    The fraction is rounded to 6 decimals before the compare so the
    admit/reject boundary is bit-identical to the DuckDB oracle replay
    (the jaccard-boundary discipline of dedup_stream.py)."""

    def __init__(
        self,
        store_path: str,
        out_path: str,
        tau: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
        unit: str = "tile",
    ):
        if unit not in ("tile", "cdc"):
            raise ValueError(f"unknown substring unit {unit!r}")
        self.store_path = store_path
        self.out_path = out_path
        self.tau = tau
        self.text_col = text_col
        self.id_col = id_col
        self.unit = unit
        self._check_or_stamp_unit()

    def _check_or_stamp_unit(self) -> None:
        import os

        marker = os.path.join(self.store_path, ".unit")
        if os.path.exists(marker):
            with open(marker) as fh:
                stored = fh.read().strip()
            if stored != self.unit:
                raise ValueError(
                    f"store at {self.store_path} was built with "
                    f"unit={stored!r}; refusing unit={self.unit!r} "
                    "(mixed-unit stores never match)"
                )
        else:
            os.makedirs(self.store_path, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(self.unit)

    def _unit_rows(self, docs: DataFrame) -> DataFrame:
        if self.unit == "cdc":
            return _cdc_unit_rows(docs, self.id_col, self.text_col)
        return _tile_rows(docs, self.id_col, self.text_col)

    def _frac_reject(
        self, counts: DataFrame, matched: DataFrame
    ) -> DataFrame:
        """ids whose round(matched_tiles / total_tiles, 6) >= tau."""
        m = matched.groupBy("id").agg(F.count(F.lit(1)).alias("m"))
        return (
            counts.join(m, "id", "left")
            .filter(
                F.round(
                    F.coalesce(F.col("m"), F.lit(0)) / F.col("nt"), 6
                )
                >= self.tau
            )
            .select("id")
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select(self.id_col, self.text_col).cache()
        tiles = self._unit_rows(batch).cache()
        counts = tiles.groupBy("id").agg(F.count(F.lit(1)).alias("nt"))

        # --- cross-batch: tile-instance semi-join against the store
        # (excluding this batch_id: a foreachBatch retry already wrote
        # its tiles, and a doc must not match itself)
        state = _read_or_none(spark, self.store_path)
        survivors = batch
        if state is not None:
            store_tiles = state.filter(
                F.col("batch_id") != F.lit(batch_id)
            ).select("tile")
            matched = tiles.join(store_tiles, "tile", "semi")
            rejected = self._frac_reject(counts, matched)
            survivors = batch.join(
                rejected,
                F.col(self.id_col) == rejected["id"],
                "left_anti",
            )

        # --- batch-internal greedy one-step: a survivor drops iff >= tau
        # of its tiles appear among LOWER-id survivors' tiles (exactly
        # the closed form the oracle unrolls per slab)
        surv_ids = survivors.select(F.col(self.id_col).alias("id"))
        st = tiles.join(surv_ids, "id")
        lower_matched = st.alias("x").join(
            st.alias("l"),
            (F.col("x.tile") == F.col("l.tile"))
            & (F.col("l.id") < F.col("x.id")),
            "semi",
        )
        internal_rejected = self._frac_reject(counts, lower_matched)
        admitted = survivors.join(
            internal_rejected,
            F.col(self.id_col) == internal_rejected["id"],
            "left_anti",
        ).cache()

        # --- persist: admitted docs + their tile rows, batch_id-owned
        # overwrite directories (retry-idempotent)
        admitted.write.mode("overwrite").parquet(
            f"{self.out_path}/batch_id={batch_id}"
        )
        tiles.join(
            admitted.select(F.col(self.id_col).alias("id")), "id"
        ).select("id", "tile").write.mode("overwrite").parquet(
            f"{self.store_path}/batch_id={batch_id}"
        )

        for df in (admitted, tiles, batch):
            df.unpersist()
