"""Relational operator surface (SURVEY.md §2 Part B) as named queries.

Each query exists twice: Spark DataFrame code (what the engine runs) and an
ANSI-SQL oracle for DuckDB. Column names/aliases are identical on both
sides; float aggregates are rounded on both sides; integer sums in the
oracle are cast back to BIGINT (DuckDB widens to HUGEINT); timestamps in
outputs are formatted to strings.

Scale notes are inline per query: which joins broadcast, where the one
shuffle is, why the plan survives 100×.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.bcast import dim_broadcast
from ..sources.tables import load_tables
from .registry import register


def _t(spark, sf_dir, *names):
    tabs = load_tables(spark, sf_dir)
    return [tabs[n] for n in names]


# ---------------------------------------------------------------- TPC-H style


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1. One map-side-combinable shuffle on a 4-value key; the
    filter and 7-column projection push into the parquet scan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. customer is tiny → broadcast into orders; the only
    real shuffle is lineitem↔orders on orderkey. Top-10 via sorted limit
    (per-partition top-k then merge — no global sort materialization)."""
    cu, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    return (
        dim_broadcast(cu.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape. region/nation/customer/supplier all broadcast; the
    only shuffle joins are orders↔lineitem. Final agg on 25 keys."""
    r, n, cu, o, li, s = _t(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem",
        "supplier",
    )
    return (
        F.broadcast(r.join(n, F.col("n_regionkey") == F.col("r_regionkey")))
        .join(cu, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            dim_broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cu, o, li, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        cu.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           round(qty, 2) AS total_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 270
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered agg then join; the big→orders join
    keys on orderkey (same partitioning as the agg → no extra shuffle under
    AQE); customer broadcasts."""
    cu, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 270)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(dim_broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("total_qty"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """Conditional aggregation (TPC-H Q12 shape)."""
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li.filter(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — a broadcast dimension join
    (part is the small side) under a pushed-down date filter, with a
    conditional-revenue ratio in one aggregation pass."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(dim_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 40)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 30 AND 50)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-attribute predicates spanning
    both join sides. Catalyst extracts the common join key and pushes the
    per-side residuals (brand/size reach the part scan as an OR'd
    PushedFilter; the cross-side conjuncts evaluate post-join) — the
    disjunction never blocks the broadcast hash join."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(dim_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        j.filter(
            arm("Brand#1", 1, 15, 1, 20)
            | arm("Brand#3", 10, 30, 20, 40)
            | arm("Brand#5", 20, 50, 30, 50)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ------------------------------------------------------------------- joins


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner(spark, sf_dir):
    o, cu = _t(spark, sf_dir, "orders", "customer")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .join(dim_broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_left_outer_agg",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS order_cnt,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer_agg(spark, sf_dir):
    """Left join preserving customers with zero orders."""
    o, cu = _t(spark, sf_dir, "orders", "customer")
    return (
        cu.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.nk, s.nk) AS nationkey, cust_cnt, supp_cnt
    FROM (SELECT c_nationkey AS nk, count(*) AS cust_cnt
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS supp_cnt
          FROM supplier WHERE s_acctbal > 0 GROUP BY s_nationkey) s
    USING (nk)
    """,
)
def join_full_outer(spark, sf_dir):
    cu, s = _t(spark, sf_dir, "customer", "supplier")
    cagg = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("cust_cnt")
    )
    sagg = (
        s.filter(F.col("s_acctbal") > 0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return cagg.join(sagg, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "cust_cnt", "supp_cnt"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    o, cu = _t(spark, sf_dir, "orders", "customer")
    return cu.join(
        o.filter(F.col("o_totalprice") > 400000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    o, cu = _t(spark, sf_dir, "orders", "customer")
    return cu.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, n_name, count(*) AS customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Star-schema dim joins: both dims broadcast — zero shuffle until the
    25-key aggregation."""
    cu, n, r = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cu.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@register(
    "join_range_bands",
    oracle="""
    SELECT band, count(*) AS orders_in_band,
           round(sum(o_totalprice), 2) AS band_revenue
    FROM orders
    JOIN (VALUES ('low', 0.0, 100000.0),
                 ('mid', 100000.0, 300000.0),
                 ('high', 300000.0, 1e9)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_range_bands(spark, sf_dir):
    """Non-equi (range/theta) join against a tiny banding dim — Spark picks
    BroadcastNestedLoopJoin, which is exactly right: O(rows × 3 bands)."""
    (o,) = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
         ("high", 300000.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("orders_in_band"),
            F.round(F.sum("o_totalprice"), 2).alias("band_revenue"),
        )
    )


@register(
    "join_asof_events",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_error_ts,
           e.value AS last_error_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
)
def join_asof_events(spark, sf_dir):
    """As-of join (each click → latest error at-or-before it, per user).

    Spark lacks a native as-of join; the scalable pattern used here is
    union-tag + window last(ignorenulls) over (user, ts): one shuffle on
    user_id, no range cross-product, no per-key blowup — survives 100×
    (vs. the naive t1.ts>=t2.ts join which is quadratic per user).
    """
    (ev,) = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    tagged = clicks.select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp_ntz").alias("err_ts"),
        F.lit(None).cast("double").alias("err_value"),
        F.lit(1).alias("is_click"),
    ).unionByName(
        errors.select(
            "event_id", "user_id", "ts",
            F.col("ts").alias("err_ts"),
            F.col("value").alias("err_value"),
            F.lit(0).alias("is_click"),
        )
    )
    # errors sort before clicks at identical ts (is_click ASC) so an error
    # at exactly click-ts is visible to it (ASOF's `<=` semantics).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumns(
            {
                "last_error_ts_t": F.last("err_ts", ignorenulls=True).over(w),
                "last_error_value": F.last("err_value", ignorenulls=True).over(w),
            }
        )
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
            F.date_format("last_error_ts_t", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_error_ts"
            ),
            "last_error_value",
        )
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r_name, sev FROM region
    CROSS JOIN (VALUES ('low'), ('mid'), ('high')) AS s(sev)
    """,
)
def join_cross_small(spark, sf_dir):
    (r,) = _t(spark, sf_dir, "region")
    sev = spark.createDataFrame([("low",), ("mid",), ("high",)], "sev string")
    return r.crossJoin(F.broadcast(sev)).select("r_name", "sev")


# ------------------------------------------------------------- aggregations


@register(
    "agg_stats_by_status",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           count(DISTINCT o_custkey) AS customers,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           round(sum(o_totalprice), 2) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats_by_status(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("o_custkey").alias("customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "agg_distinct_exact",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS parts,
           count(DISTINCT l_suppkey) AS supps,
           count(*) AS rows_cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_exact(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.count(F.lit(1)).alias("rows_cnt"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           1 AS est_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++) next to the exact count. The raw HLL
    estimate differs by engine, so what the oracle hash-checks is (a) the
    exact counts and (b) an in-query assertion that the estimate lands
    within 3 standard deviations of exact (rsd=0.02 → 6%) — the oracle
    emits the constant 1, so an out-of-bound estimate fails the gate."""
    (li,) = _t(spark, sf_dir, "lineitem")
    est = F.approx_count_distinct("l_partkey", 0.02)
    exact = F.countDistinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        F.when(F.abs(est - exact) / exact <= 0.06, 1)
        .otherwise(0)
        .alias("est_in_bound"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS cnt,
           round(sum(c_acctbal), 2) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    cu, n, r = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cu.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT n_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           count(*) AS cnt
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE c_custkey < 100
    GROUP BY n_nationkey
    """,
)
def agg_string_agg(spark, sf_dir):
    """collect_list is unordered across partitions → sort_array before
    joining, making the result deterministic and oracle-comparable."""
    cu, n = _t(spark, sf_dir, "customer", "nation")
    return (
        F.broadcast(n)
        .join(cu.filter(F.col("c_custkey") < 100),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias(
                "names"
            ),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# --------------------------------------------------------- window functions


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Per-key top-k via ranking window — single shuffle on the key; at
    scale this beats global sort since each partition ranks locally."""
    (o,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey",
            "o_totalprice", "rn",
        )
    )


@register(
    "window_ranks",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
)
def window_ranks(spark, sf_dir):
    (cu,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cu.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(wt).cast("bigint").alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 2) AS delta_value,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


@register(
    "window_distribution_funcs",
    oracle="""
    SELECT doc_id, lang,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) + 0 AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM documents
    WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
    """,
)
def window_distribution_funcs(spark, sf_dir):
    """Distribution-family window functions (ntile / percent_rank /
    cume_dist) — per-language document-length quartiles and percentile
    positions, the bucketing primitive for curriculum ordering and
    length-stratified analysis. Fully deterministic: the ordering
    tie-breaks on doc_id, so bucket boundaries are engine-independent."""
    (d,) = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "lang",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS moving_avg3
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
    )


# ----------------------------------------------------------- sort / set ops


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_global(spark, sf_dir):
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, no full sort shuffle."""
    (o,) = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_union(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    a = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_intersect(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    a = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def set_except(spark, sf_dir):
    o, cu = _t(spark, sf_dir, "orders", "customer")
    return cu.select(F.col("c_custkey")).exceptAll(
        o.select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


# ------------------------------------------------------------ scalar funcs


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           substring(c_name, 10, 6) AS name_digits,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           CAST(length(c_name) AS BIGINT) AS name_len,
           concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tagged,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS shortname,
           string_split(c_name, '#')[1] AS name_prefix,
           reverse(c_mktsegment) AS seg_rev
    FROM customer WHERE c_custkey < 500
    """,
)
def scalar_string_funcs(spark, sf_dir):
    """String function coverage — every function the reference's routing
    path uses (substring/concat_ws/lower/length/regexp_extract, SURVEY.md
    §2 scalar row) plus common extras."""
    (cu,) = _t(spark, sf_dir, "customer")
    return cu.filter(F.col("c_custkey") < 500).select(
        "c_custkey",
        F.substring("c_name", 10, 6).alias("name_digits"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "tagged"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "shortname"
        ),
        F.split("c_name", "#").getItem(0).alias("name_prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
             AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
    FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_date_funcs(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp_ntz"), F.col("o_orderdate")
        ).cast("bigint").alias("days_to_y2k"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events WHERE event_id < 3000
    """,
)
def scalar_json_funcs(spark, sf_dir):
    """JSON access — the engine's bread and butter (envelope parsing uses
    the same machinery: from_json/get_json_object)."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 3000).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 200000) AS dist_from_200k,
           round(o_totalprice, -3) AS price_k,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_floor_k,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_ceil_k,
           ((o_orderkey % 7) + 7) % 7 AS pmod7,
           round(sqrt(o_totalprice), 6) AS price_sqrt,
           round(ln(o_totalprice), 6) AS price_ln,
           round(pow(o_orderkey % 10, 2), 1) AS sq
    FROM orders WHERE o_orderkey < 2000 AND o_totalprice > 0
    """,
)
def scalar_math_funcs(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") < 2000) & (F.col("o_totalprice") > 0)).select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 200000).alias("dist_from_200k"),
        F.round(F.col("o_totalprice"), -3).alias("price_k"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_floor_k"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_ceil_k"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("pmod7"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("o_orderkey") % 10, 2), 1).alias("sq"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           least(o_totalprice, 250000.0) AS capped,
           greatest(o_totalprice, 1000.0) AS floored
    FROM orders WHERE o_orderkey < 3000
    """,
)
def scalar_conditional(spark, sf_dir):
    (o,) = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floored"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact continuous percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: both linear-interpolate between order statistics).
    Exact percentile is a full-sort-per-group aggregate; at 100 TB switch
    to ``approx_percentile`` (t-digest, map-side combinable) — kept exact
    here because the oracle gate needs bit-stable values."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.percentile("l_extendedprice", F.lit(q)), 4
            ).alias(f"p{int(q * 100):02d}")
            for q in (0.25, 0.50, 0.75, 0.99)
        ]
    )


@register(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) + 0 AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(stddev_samp(l_discount), 6) AS discount_sd,
           round(var_samp(l_tax), 6) AS tax_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark, sf_dir):
    """Second-moment statistics (corr/covar/stddev/variance) — all
    map-side-combinable aggregates (Welford-style merge), one shuffle on
    the group key."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0))
        .alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_sd"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT) AS orders_30d,
           round(sum(o_totalprice) OVER w, 2) AS revenue_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, not row-based): per customer, rolling
    30-day order count + revenue. Range frames need a numeric/temporal
    order key — epoch days here; one shuffle on the partition key, frame
    evaluation is a per-partition sliding scan (no re-sort per row)."""
    (o,) = _t(spark, sf_dir, "orders")
    days = (F.unix_timestamp("o_orderdate") / 86400).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
    )


@register(
    "subquery_above_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT avg(o_totalprice) FROM orders i
      WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def subquery_above_avg(spark, sf_dir):
    """Correlated-scalar-subquery semantics (orders 50% above their
    customer's average) — planned as a window average over the customer
    partition + filter: ONE shuffle instead of the naive
    aggregate-then-rejoin (two)."""
    (o,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
)
def set_intersect_all(spark, sf_dir):
    """Multiset intersection (duplicates preserved up to the min of the
    two multiplicities — the bag-semantics variant of set_intersect)."""
    (o,) = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    b = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
)
def set_except_all(spark, sf_dir):
    """Multiset difference (each right occurrence cancels one left
    occurrence)."""
    (o,) = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    b = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return a.exceptAll(b)


@register(
    "join_salted_skew",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, o.o_custkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 200000
    """,
)
def join_salted_skew(spark, sf_dir):
    """The salted-join operator under the oracle gate: same result set as
    the plain equi-join (operators/skew.py guarantees inner-join
    equivalence), with the fact side's hot keys spread over 8 deterministic
    salt buckets. AQE's skew splitting handles moderate skew on its own —
    salting is the explicit tool for pathological keys."""
    from ..operators.skew import salted_join

    li, o = _t(spark, sf_dir, "lineitem", "orders")
    dim = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    return salted_join(
        li.select("l_orderkey", "l_partkey"), dim, ["l_orderkey"], "inner",
        salts=8,
    )


@register(
    "agg_hll_sketch",
    # Sketch ESTIMATES are engine-specific (Datasketches vs DuckDB HLL),
    # so the hash-checked output is the exact distinct count plus an
    # in-query error-bound gate on the estimate: the oracle pins the
    # exact counts and asserts the gate is TRUE — a green row proves the
    # sketch machinery ran AND landed within 5% of truth (the recall-gate
    # pattern; estimates here are deterministic given pinned data+engine).
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS rows_cnt,
           CAST(count(DISTINCT o_custkey) AS BIGINT)
             AS distinct_customers,
           TRUE AS est_within_5pct
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL',
           CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           TRUE
    FROM orders
    """,
)
def agg_hll_sketch(spark, sf_dir):
    """Mergeable HLL sketches (Datasketches): per-status sketch of
    distinct customers, unioned across statuses — the at-scale distinct
    pattern: sketches are tiny, partial-aggregate map-side, and REUSABLE
    (store per-partition sketches once, merge for any rollup later,
    instead of rescanning for every approx_count_distinct). The exact
    distinct count rides along purely as the oracle-checkable error
    gate on the estimate (also asserted in pytest)."""
    (o,) = _t(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("rows_cnt"),
        F.count_distinct("o_custkey").alias("distinct_customers"),
    )
    gated = lambda est: (  # noqa: E731
        F.abs(est.cast("double") / F.col("distinct_customers") - 1.0)
        <= 0.05
    )
    return per_status.select(
        "o_orderstatus",
        "rows_cnt",
        "distinct_customers",
        gated(F.hll_sketch_estimate("sk")).alias("est_within_5pct"),
    ).unionByName(
        # the ALL row MERGES the per-status sketches (the reuse pattern —
        # no rescan for the rollup); only the exact gate value needs one
        # 1-row broadcast from a direct distinct
        per_status.agg(
            F.hll_union_agg("sk").alias("u"),
            F.sum("rows_cnt").alias("rows_cnt"),
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count_distinct("o_custkey").alias(
                        "distinct_customers"
                    )
                )
            )
        )
        .select(
            F.lit("ALL").alias("o_orderstatus"),
            "rows_cnt",
            "distinct_customers",
            gated(F.hll_sketch_estimate("u")).alias("est_within_5pct"),
        )
    )


# ------------------------------------------------- subquery decorrelation set
# TPC-H Q4/Q13/Q15/Q17/Q21/Q22 shapes, adapted to this testdata's reduced
# schema (no partsupp/commitdate/phone columns — predicates substituted,
# join/subquery structure preserved). Together they cover the decorrelation
# patterns a warehouse engine must handle: EXISTS → left-semi, NOT EXISTS →
# left-anti, correlated scalar agg → join against a grouped subplan, and
# uncorrelated scalar agg → one-row broadcast cross join.


@register(
    "q4_priority_late_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS over lineitem → left-semi join on
    the order key with the correlated inequality in the join condition.
    Catalyst keeps it one shuffle pair (orders is the small filtered side);
    at scale the semi-join never materializes lineitem columns."""
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    late = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer-join-preserving count distribution. The
    non-equi predicate lives in the JOIN condition (not WHERE — that would
    turn the outer join inner); customers with zero surviving orders count
    as c_count=0. Two agg shuffles, both on low-cardinality keys."""
    cu, o = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cu.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: grouped revenue view + uncorrelated scalar MAX
    subquery. The one-row max broadcasts into a cross join (no second scan
    of lineitem — the rev subplan is reused for both sides). Revenue sums
    DECIMAL(18,4): per-element rounding then exact decimal addition, so
    the max-equality is partition-order-independent on any engine."""
    li, s = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .select(
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("r"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("r").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(dim_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = lineitem.l_partkey
    )
    GROUP BY p_brand
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar AVG decorrelated into a grouped
    subplan joined back on the part key. l_quantity is integer-valued, so
    the per-part avg (exact integer sum / count) is bit-identical across
    engines and partitionings — the 0.2·avg threshold is safe to compare.
    Both lineitem reads share one scan; the per-part avg is the smaller
    side and shuffles on the same key as the join."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .join(dim_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q21_last_shipper",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q21_last_shipper(spark, sf_dir):
    """TPC-H Q21 shape: the hardest decorrelation in the suite — a
    correlated EXISTS (another supplier in the order) AND a correlated
    NOT EXISTS with an inequality (nobody shipped later). Left-semi then
    left-anti self-joins on the order key; all three lineitem sides
    shuffle on l_orderkey, so AQE plans them into one exchange reuse."""
    s, li, o = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = l1.join(
        o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l1.l_orderkey") == F.col("o_orderkey"),
    )
    multi = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    last = multi.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        last.join(
            dim_broadcast(s), F.col("s_suppkey") == F.col("l1.l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT n_name, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n_name
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar AVG (one-row broadcast cross
    join — never a collect) + NOT EXISTS anti-join against recent orders
    ("no order in the last years" — this data has no order-less
    customers). The anti-join side projects only o_custkey after the date
    filter pushes to the scan, so the shuffle carries one column."""
    cu, o, n = _t(spark, sf_dir, "customer", "orders", "nation")
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = cu.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(
        o.filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
        ).select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
    FROM part
    JOIN offers ON p_partkey = l_partkey
    JOIN euro   ON s_suppkey = l_suppkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND unit_cost = (
        SELECT min(o2.unit_cost) FROM offers o2
        JOIN euro e2 ON e2.s_suppkey = o2.l_suppkey
        WHERE o2.l_partkey = p_partkey
      )
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp table in this schema — the
    supplier×part offer relation is derived from lineitem, unit_cost =
    min(l_extendedprice/l_quantity) per pair; reference schema has no
    ps_supplycost either, SURVEY.md §1). The correlated MIN subquery
    decorrelates into a grouped min over the region-filtered offers,
    joined back on (partkey, unit_cost) equality. unit_cost stays a raw
    IEEE double — MIN involves no summation, so it is bit-identical on
    both engines and the min-equality join is exact (a decimal cast
    would actually DIVERGE: Spark rounds half-up, DuckDB half-even on
    double→decimal ties). supplier/
    nation/region (~100 rows) broadcast; the one big shuffle is the
    offers groupBy on (l_partkey, l_suppkey) — reused for both the
    candidate side and the per-part min side."""
    li, p, s, n, r = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    euro = (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            r.filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("uc"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("unit_cost"))
    )
    euro_offers = offers.join(
        dim_broadcast(euro), F.col("s_suppkey") == F.col("l_suppkey")
    )
    per_part_min = euro_offers.groupBy(
        F.col("l_partkey").alias("mpk")
    ).agg(F.min("unit_cost").alias("min_cost"))
    return (
        euro_offers.join(
            per_part_min,
            (F.col("l_partkey") == F.col("mpk"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(
            dim_broadcast(
                p.filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "unit_cost",
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               AS volume
      FROM supplier
      JOIN lineitem  ON s_suppkey = l_suppkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bi-national shipping volume by year. supplier and both
    nation aliases broadcast (the nation filter halves each side before
    the join); the real shuffles are lineitem↔orders on orderkey and
    orders↔customer on custkey. The disjunctive nation-pair predicate
    stays above the joins — Catalyst pushes each half into the
    respective dimension scan via constraint propagation."""
    s, li, o, cu, n = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = ("NATION_1", "NATION_2")
    n1 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp_ntz"),
                F.lit("1997-12-31").cast("timestamp_ntz"),
            )
        )
        .join(
            dim_broadcast(
                s.join(n1, F.col("s_nationkey") == F.col("n1_key")).select(
                    "s_suppkey", "supp_nation"
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            cu.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
                "c_custkey", "cust_nation"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume").cast("double"), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem  ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share within a region. Every dimension
    (part-filtered, supplier+nation, customer-nation-region) broadcasts;
    lineitem↔orders on orderkey is the only large shuffle. Volumes sum
    as DECIMAL(18,4) (exact, partition-order-independent) and only the
    final share ratio drops to DOUBLE — the round(…,6) is then stable
    across engines."""
    p, li, s, o, cu, n, r = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders",
        "customer", "nation", "region",
    )
    asia_cust = (
        cu.join(
            F.broadcast(
                n.join(
                    r.filter(F.col("r_name") == "ASIA"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select(F.col("n_nationkey").alias("cn_key"))
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        ).select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), "n_name")),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    joined = (
        li.join(
            dim_broadcast(p.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(dim_broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            o.filter(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01").cast("timestamp_ntz"),
                    F.lit("1997-12-31").cast("timestamp_ntz"),
                )
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(asia_cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    )
    vol = joined.select(
        F.year("o_orderdate").alias("o_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("volume"),
        "nation",
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))
               AS amount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: no ps_supplycost in this schema — cost is
    proxied as 0.6·p_retailprice per unit, keeping the
    profit-by-nation-and-year plan shape intact). part is filtered by the
    non-anchored LIKE (evaluated in the scan), then part/supplier/nation
    broadcast into lineitem; lineitem↔orders is the single big shuffle,
    followed by one map-side-combinable agg on a (25×years)-value key."""
    li, s, p, o, n = _t(
        spark, sf_dir, "lineitem", "supplier", "part", "orders", "nation"
    )
    joined = (
        li.join(
            dim_broadcast(p.filter(F.col("p_name").like("%bolt%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            dim_broadcast(
                s.join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
                    "s_suppkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
            )
            .cast("decimal(18,4)")
            .alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM val
    WHERE part_value > (SELECT sum(part_value) * 0.001 FROM val)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (adapted: stock value per part is derived from
    lineitem revenue through region-local suppliers — no partsupp in
    this schema). Grouped value view + uncorrelated scalar threshold
    subquery: the one-row total broadcasts into a cross join, the val
    subplan is computed once and reused for both sides. DECIMAL sums
    make the >-threshold comparison exact on both engines."""
    li, s, n, r = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    euro_supp = (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            r.filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    val = (
        li.join(
            dim_broadcast(euro_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("v"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("v").alias("part_value"))
    )
    threshold = val.agg((F.sum("part_value") * 0.001).alias("cut"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cut"))
        .select(
            "l_partkey", F.col("part_value").cast("double").alias("part_value")
        )
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'SMALL'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape (adapted: the part↔supplier relation comes from
    lineitem; the "complaints" exclusion subquery keeps its NOT IN form,
    proxied by negative account balance). NOT IN over a non-nullable key
    → left-anti broadcast join (s_suppkey is never null here, so anti-join
    and NOT IN agree). The distinct-count shuffles once on the grouping
    key with the suppkey attached; part broadcasts."""
    li, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep = li.join(
        dim_broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    pf = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "SMALL")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        keep.join(dim_broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_part_promotion",
    oracle="""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50
      )
    """,
)
def q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape (adapted: the availqty-vs-half-shipped predicate
    becomes a shipped-quantity threshold per (supplier, part) — no
    partsupp in this schema, but the nested IN → grouped HAVING →
    semi-join decorrelation is identical). The inner grouped plan
    shuffles lineitem once on (suppkey, partkey) after the part LIKE
    and date filters cut it down; the outer side is a ~20-row
    supplier×nation×region join probed via left-semi broadcast."""
    s, n, r, li, p = _t(
        spark, sf_dir, "supplier", "nation", "region", "lineitem", "part"
    )
    promo_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(
            dim_broadcast(p.filter(F.col("p_name").like("red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            r.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            promo_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "n_name")
    )


@register(
    "agg_approx_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.50), 2) AS p50_exact,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95_exact,
           1 AS approx_in_bound
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_percentiles(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch — the mergeable
    one-pass structure you use at 100 TB, where exact percentiles need a
    per-group sort) next to the exact interpolated percentile. Sketch
    internals differ by engine, so the oracle hash-checks (a) the exact
    p50/p95 (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, same
    linear interpolation) and (b) an in-query RANK-window assertion: the
    sketch value must lie between the exact percentiles at q∓0.02 —
    value-space bounds would be data-dependent, rank bounds are not.
    accuracy=10000 → rank error ≤ 0.01%, so the 2% window is loose; an
    out-of-bound sketch collapses the constant to 0 and fails the gate."""
    (o,) = _t(spark, sf_dir, "orders")

    def pct(q):
        return F.expr(f"percentile(o_totalprice, {q})")

    def apx(q):
        return F.expr(f"percentile_approx(o_totalprice, {q}, 10000)")

    in_bound = (
        apx(0.50).between(pct(0.48), pct(0.52))
        & apx(0.95).between(pct(0.93), pct(0.97))
    )
    return o.groupBy("o_orderstatus").agg(
        F.round(pct(0.50), 2).alias("p50_exact"),
        F.round(pct(0.95), 2).alias("p95_exact"),
        F.when(in_bound, 1).otherwise(0).alias("approx_in_bound"),
    )


@register(
    "unpivot_price_components",
    oracle="""
    SELECT l_returnflag, component, round(sum(amount), 2) AS total
    FROM (
      SELECT l_returnflag, 'base' AS component,
             l_extendedprice AS amount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount_amt',
             l_extendedprice * l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax_amt',
             l_extendedprice * (1 - l_discount) * l_tax FROM lineitem
    )
    GROUP BY l_returnflag, component
    """,
)
def unpivot_price_components(spark, sf_dir):
    """Wide→long reshaping via ``unpivot`` (melt): three derived price
    components become (component, amount) rows, then a grouped sum. One
    scan — the unpivot is a map-side Expand (3 output rows per input, no
    self-union re-scan, which is what the UNION ALL oracle would cost if
    executed literally); one agg shuffle on the (flag, component) key."""
    (li,) = _t(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("base"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias(
            "discount_amt"
        ),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * F.col("l_tax")
        ).alias("tax_amt"),
    )
    long = wide.unpivot(
        ["l_returnflag"],
        ["base", "discount_amt", "tax_amt"],
        "component",
        "amount",
    )
    return long.groupBy("l_returnflag", "component").agg(
        F.round(F.sum("amount"), 2).alias("total")
    )


@register(
    "join_asof_forward_tolerance",
    oracle="""
    WITH matched AS MATERIALIZED (
      SELECT e.event_id, e.user_id, e.ts AS ets, c.ts AS cts,
             c.value AS next_click_value
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.ts <= c.ts
    )
    SELECT event_id, user_id,
           strftime(ets, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
           strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS next_click_ts,
           next_click_value
    FROM matched
    WHERE cts <= ets + INTERVAL 2 HOUR
    """,
)
def join_asof_forward_tolerance(spark, sf_dir):
    """FORWARD as-of join with tolerance: each error → the next click
    at-or-after it, per user, kept only when within 2 hours (the
    recovery-latency join). Same union-tag + window pattern as the
    backward variant (one shuffle on user_id, no range cross-product),
    mirrored: ``first(ignorenulls)`` over [current, unbounded following],
    errors sorting before clicks at identical timestamps so an
    exact-tie click is visible (ASOF ``<=``). The tolerance is a
    row-local filter after the window — matched-beyond-tolerance rows
    drop, mirroring the oracle's inner-ASOF + WHERE."""
    (ev,) = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    tagged = errors.select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"),
    ).unionByName(
        clicks.select(
            "event_id", "user_id", "ts",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
            F.lit(1).alias("is_click"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        tagged.withColumns(
            {
                "next_click_ts_t": F.first("click_ts", ignorenulls=True).over(w),
                "next_click_value": F.first(
                    "click_value", ignorenulls=True
                ).over(w),
            }
        )
        .filter(
            (F.col("is_click") == 0)
            & F.col("next_click_ts_t").isNotNull()
            & (
                F.col("next_click_ts_t")
                <= F.col("ts") + F.expr("INTERVAL 2 HOURS")
            )
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "error_ts"
            ),
            F.date_format(
                "next_click_ts_t", "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("next_click_ts"),
            "next_click_value",
        )
    )


@register(
    "scalar_try_funcs",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(o_custkey % 3, 0) AS safe_div,
           try_cast(o_orderpriority AS INTEGER) AS bad_cast_null,
           CASE WHEN o_orderkey % 2 = 0
                THEN try_cast(substring(o_orderpriority, 1, 1) AS INTEGER)
           END AS prio_digit
    FROM orders
    """,
)
def scalar_try_funcs(spark, sf_dir):
    """ANSI-mode error-safe function family: Spark 4 runs ANSI SQL
    (overflow/bad-cast/div-by-zero THROW), so production pipelines reach
    for ``try_divide`` / ``try_cast`` where dirty data must degrade to
    NULL instead of failing the job — the per-row error-tolerance story
    that matters on 100 TB of unvetted input."""
    (o,) = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide("o_totalprice", F.col("o_custkey") % 3).alias(
            "safe_div"
        ),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast_null"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)"),
        ).alias("prio_digit"),
    )


@register(
    "scalar_calendar_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(round(date_diff('month', DATE '1995-01-01',
                CAST(o_orderdate AS DATE))
                + date_sub('day', date_trunc('month',
                    CAST(o_orderdate AS DATE)), CAST(o_orderdate AS DATE))
                  / 31.0, 4) AS DOUBLE) AS months_since_epoch_approx,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS woy,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY,
                    '%Y-%m-%d') AS plus_45d
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def scalar_calendar_funcs(spark, sf_dir):
    """Calendar function family: months_between (fractional, matching
    DuckDB's month-diff + day-fraction reconstruction), last_day,
    day-of-week (Spark dayofweek is 1=Sunday, same as DuckDB's
    dayofweek+1 — reconciled below), ISO week-of-year, interval
    arithmetic. All map-side literals-in-codegen; the %100 filter pushes
    to the scan."""
    (o,) = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.round(
            F.months_between(d, F.lit("1995-01-01").cast("date")), 4
        ).alias("months_since_epoch_approx"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek(d) - 1).cast("int").alias("dow"),
        F.weekofyear(d).cast("int").alias("woy"),
        F.date_format(F.date_add(d, 45), "yyyy-MM-dd").alias("plus_45d"),
    )


@register(
    "agg_rollup_grouping_id",
    oracle="""
    SELECT coalesce(r_name, '<all>') AS region_lvl,
           coalesce(n_name, '<all>') AS nation_lvl,
           CAST(GROUPING(r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
           count(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_grouping_id(spark, sf_dir):
    """ROLLUP with ``grouping()`` disambiguation: a NULL produced by the
    rollup's subtotal rows is indistinguishable from a NULL in the data
    unless the grouping indicator says which it is — the classic
    report-layer trap. Both engines emit the same indicator bits, so the
    subtotal structure itself is hash-checked, not just the totals."""
    cu, n, r = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cu.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_lvl"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_lvl"),
            "g_region",
            "g_nation",
            "cnt",
        )
    )


@register(
    "window_nulls_ordering",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           nullable_price,
           CAST(row_number() OVER (
             PARTITION BY o_orderstatus
             ORDER BY nullable_price ASC NULLS LAST, o_orderkey
           ) AS BIGINT) AS rn_nulls_last,
           CASE WHEN nullable_price IS NULL THEN 1 ELSE 0 END AS is_null
    FROM (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE round(o_totalprice, 2) END AS nullable_price
      FROM orders WHERE o_orderkey % 50 = 0
    )
    """,
)
def window_nulls_ordering(spark, sf_dir):
    """Explicit NULL-ordering in window sorts — the cross-engine trap:
    Spark's default is NULLS FIRST for ASC, DuckDB's is NULLS LAST, so
    any ranking over a nullable key silently disagrees between engines
    unless pinned. Both sides here pin ASC NULLS LAST (+ a unique
    tiebreak so ranks are total); the hash check proves the pinned
    semantics, not either engine's default."""
    (o,) = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.round("o_totalprice", 2))
        .alias("nullable_price"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("nullable_price").asc_nulls_last(), F.col("o_orderkey")
    )
    return base.select(
        "o_orderkey",
        "o_orderstatus",
        "nullable_price",
        F.row_number().over(w).cast("bigint").alias("rn_nulls_last"),
        F.when(F.col("nullable_price").isNull(), 1)
        .otherwise(0)
        .alias("is_null"),
    )
