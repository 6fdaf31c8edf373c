"""Threshold-gated broadcast for scale-factor-growing dimensions.

A hard broadcast hint on a dimension is right when the relation is CONSTANT or
metadata-bounded (region/nation, centroids, 1-row aggregates, literal
band tables) and wrong when the relation grows with the corpus: the
hint overrides Catalyst and AQE forever, so a supplier/customer/part
dimension that is 1 MB at sf0.1 becomes a driver-OOM broadcast at
100 TB (VERDICT r8 "What's wrong" #4).

``dim_broadcast`` asks the optimizer for the relation's size ESTIMATE
(plan stats — file sizes × selectivity, no job) and applies the hint
only while the estimate is under the session's
``autoBroadcastJoinThreshold``. Below the bar the plan is byte-for-byte
the old hinted plan (the AQE-off bench keeps its broadcasts); past it
the join falls back to Catalyst/AQE, which can still broadcast at
RUNTIME from true sizes, or pick a spillable SMJ. Estimates can
overshoot on join/aggregate subtrees — that direction is safe (we
decline a hint AQE can reinstate; the failure mode of a hard hint is
the unsafe direction).

PLANS.md §broadcast-census records every broadcast site in the repo
with its growth bound; tests/test_broadcast_census.py pins the set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast-hint ``df`` only if its optimizer size estimate fits
    the session's autoBroadcastJoinThreshold. For dimensions that grow
    with the scale factor; constant/metadata relations should keep a
    plain ``F.broadcast``."""
    try:
        limit = int(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:
        limit = 10 * 1024 * 1024
    if limit <= 0:
        # broadcasts disabled session-wide — never hint against that
        return df
    est = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    return F.broadcast(df) if est <= limit else df
