#!/usr/bin/env python
"""Build the sf1-equivalent working set used by PERF.md §10/§15/§18.

10 key-shifted replicas of the sf0.1 tables, written to --out (default
/tmp/sfx1) with explicit parquet ROW_GROUP_SIZE so Spark gets splittable
scans (DuckDB's default packs 50k docs into ONE row group → 1-task scan,
the §10 layout lesson).  Replica construction:

- documents: doc_id + r·10_000 (stays below the planted-variant offsets
  CLONE_OFFSET=1M / NEAR_OFFSET=2M), text gains a per-replica tag token
  so replicas are distinct docs (cross-replica near-dup pairs still
  appear — §10's caveat — but both engines bear the identical workload).
- embeddings: vec_id + r·10_000; first dimension shifted by r·0.01 so
  replicas don't create exact distance ties (tie-break semantics would
  otherwise dominate the top-k compare).
- events: event_id + r·10_000_000, user_id + r·10_000 — per-user
  sequences stay intact inside each replica, so sessionization/CEP
  semantics scale by user count, not sequence length.
- remaining 7 TPC-H-ish tables: copied as-is (they are not the scaling
  subject; queries that join them still resolve).

Deterministic: pure SQL over the source files, no randomness.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

REPLICAS = 10
DOC_STEP = 10_000
EVENT_STEP = 10_000_000
USER_STEP = 10_000
ORDER_STEP = 1_000_000
CUST_STEP = 100_000


def build(src: str, out: str, replicas: int = REPLICAS,
          tpch: bool = False) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = f"range({replicas})"

    # Fail fast if a source id span exceeds its replica step — silent
    # cross-replica id collisions would corrupt dedup / per-user
    # sequence semantics and every PERF number derived from the set.
    (max_doc,) = con.execute(
        f"SELECT max(doc_id) FROM '{src}/documents.parquet'"
    ).fetchone()
    (max_ev, max_user) = con.execute(
        f"SELECT max(event_id), max(user_id) FROM '{src}/events.parquet'"
    ).fetchone()
    if max_doc >= DOC_STEP:
        raise ValueError(f"doc_id span {max_doc} >= DOC_STEP {DOC_STEP}")
    if max_ev >= EVENT_STEP:
        raise ValueError(f"event_id span {max_ev} >= EVENT_STEP {EVENT_STEP}")
    if max_user >= USER_STEP:
        raise ValueError(f"user_id span {max_user} >= USER_STEP {USER_STEP}")
    if replicas * DOC_STEP >= 1_000_000:
        raise ValueError(
            "replica doc_ids would collide with the planted-variant "
            "offsets (CLONE_OFFSET=1M / NEAR_OFFSET=2M)"
        )

    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.range * {DOC_STEP} AS doc_id,
                 d.text || ' rep' || r.range AS text,
                 d.lang, d.source,
                 d.n_chars + 4 + len(CAST(r.range AS VARCHAR)) AS n_chars
          FROM '{src}/documents.parquet' d CROSS JOIN {rng} r
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.range * {DOC_STEP} AS vec_id,
                 list_prepend(e.embedding[1] + r.range * 0.01,
                              e.embedding[2:]) AS embedding,
                 e.label
          FROM '{src}/embeddings.parquet' e CROSS JOIN {rng} r
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2000)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.range * {EVENT_STEP} AS event_id,
                 e.ts,
                 e.user_id + r.range * {USER_STEP} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{src}/events.parquet' e CROSS JOIN {rng} r
          ORDER BY user_id, ts
        ) TO '{out}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
        """
    )
    if tpch:
        # Key-shifted replicas of the three q18-shape tables so the
        # relational decade scales too (PERF §21).  Steps exceed each
        # key's source span (o_orderkey/l_orderkey < 1M, c_custkey <
        # 100k at sf0.1 — asserted below), so per-order line items and
        # per-customer orders stay intact inside a replica: join
        # fan-outs and HAVING sums scale by replica count, never mix.
        (max_ok, max_ck) = con.execute(
            f"SELECT max(o_orderkey), max(o_custkey)"
            f" FROM '{src}/orders.parquet'"
        ).fetchone()
        if max_ok >= ORDER_STEP or max_ck >= CUST_STEP:
            raise ValueError(
                f"order/cust key span ({max_ok}, {max_ck}) exceeds "
                f"replica steps ({ORDER_STEP}, {CUST_STEP})"
            )
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                       c_custkey + r.range * {CUST_STEP} AS c_custkey)
              FROM '{src}/customer.parquet' CROSS JOIN {rng} r
              ORDER BY c_custkey
            ) TO '{out}/customer.parquet'
              (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                       o_orderkey + r.range * {ORDER_STEP} AS o_orderkey,
                       o_custkey + r.range * {CUST_STEP} AS o_custkey)
              FROM '{src}/orders.parquet' CROSS JOIN {rng} r
              ORDER BY o_orderkey
            ) TO '{out}/orders.parquet'
              (FORMAT PARQUET, ROW_GROUP_SIZE 200000)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT * REPLACE (
                       l_orderkey + r.range * {ORDER_STEP} AS l_orderkey)
              FROM '{src}/lineitem.parquet' CROSS JOIN {rng} r
              ORDER BY l_orderkey
            ) TO '{out}/lineitem.parquet'
              (FORMAT PARQUET, ROW_GROUP_SIZE 500000)
            """
        )
        copy_only = ("region", "nation", "supplier", "part")
    else:
        copy_only = ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem")
    for t in copy_only:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")


def build_docs_only(src: str, out: str, replicas: int,
                    link_rest_from: str) -> None:
    """Documents-only replica set for the second decade (PERF §39):
    replicates ONLY documents.parquet (990 replicas → doc_ids up to
    ~9.9M, PAST the planted-variant offsets — so this set is valid
    ONLY for queries that read the plain corpus, never the
    _docs_with_dups/_docs_with_near_dups families) and symlinks the
    other nine tables from an existing set so load_tables/oracle view
    registration still resolve.

    Only the replicas*DOC_STEP-vs-CLONE_OFFSET collision guard is
    waived (that is the point of the second decade); the per-file
    doc_id span guard still applies — a source whose doc_ids span
    >= DOC_STEP would silently produce cross-replica collisions."""
    con = duckdb.connect()
    (max_doc,) = con.execute(
        f"SELECT max(doc_id) FROM '{src}/documents.parquet'"
    ).fetchone()
    if max_doc >= DOC_STEP:
        raise ValueError(f"doc_id span {max_doc} >= DOC_STEP {DOC_STEP}")
    os.makedirs(out, exist_ok=True)
    rest_abs = os.path.abspath(link_rest_from)
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        dst = os.path.join(out, f"{t}.parquet")
        # lexists: an existing-but-dangling symlink (linked-from dir
        # deleted) must be replaced, and exists() can't see it.
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.join(rest_abs, f"{t}.parquet"), dst)
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.range * {DOC_STEP} AS doc_id,
                 d.text || ' rep' || r.range AS text,
                 d.lang, d.source,
                 d.n_chars + 4 + len(CAST(r.range AS VARCHAR)) AS n_chars
          FROM '{src}/documents.parquet' d CROSS JOIN range({replicas}) r
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
        """
    )


def build_docs_differentiated(src: str, out: str, replicas: int,
                              link_rest_from: str) -> None:
    """Documents-only replica set with DIFFERENTIATED replicas, for the
    second-decade rows of the NEAR-DUP-FAMILY operators (jaccard /
    substring-RK — VERDICT r10 item 2). The plain docs-only set keeps
    replicas near-identical (one tag token), which is fine for corpus-
    statistics queries but DEGENERATE for a jaccard>=0.8 pair join: at
    990 replicas every replica pair of every doc crosses the threshold
    and the OUTPUT (not the algorithm) grows ~replicas² — 100x sfx10's
    already-caveated cross-replica volume. Here each replica gains a
    unique token prefix ~1/3 of its length, pushing cross-replica
    3-gram Jaccard to ~0.6 (measured band 0.33-0.59 over the length
    distribution) — safely below 0.8, so pair output is driven by the
    offsets a measurement harness PLANTS (tools/sfx_dups_decade.py uses
    10M/20M), like a real deduplicated-crawl workload.

    Same span guard and symlink handling as build_docs_only."""
    con = duckdb.connect()
    (max_doc,) = con.execute(
        f"SELECT max(doc_id) FROM '{src}/documents.parquet'"
    ).fetchone()
    if max_doc >= DOC_STEP:
        raise ValueError(f"doc_id span {max_doc} >= DOC_STEP {DOC_STEP}")
    os.makedirs(out, exist_ok=True)
    rest_abs = os.path.abspath(link_rest_from)
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.join(rest_abs, f"{t}.parquet"), dst)
    con.execute(
        f"""
        COPY (
          -- n_chars = length of the EMITTED text (ADVICE r11: the
          -- prefixed/suffixed replica text must keep the corpus-wide
          -- n_chars == length(text) invariant the other builders hold)
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM (
            SELECT d.doc_id + r.range * {DOC_STEP} AS doc_id,
                   array_to_string(list_transform(
                     generate_series(1, greatest(8, CAST(ceil(
                       len(list_filter(string_split(d.text, ' '),
                                       x -> x <> '')) / 3.0) AS BIGINT))),
                     i -> 'p' || i || 'r' || r.range), ' ')
                   || ' ' || d.text || ' rep' || r.range AS text,
                   d.lang, d.source
            FROM '{src}/documents.parquet' d CROSS JOIN range({replicas}) r
          )
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
        """
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfx1")
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument(
        "--tpch", action="store_true",
        help="also key-shift-replicate customer/orders/lineitem "
             "(q18-shape relational scaling) instead of copying them",
    )
    ap.add_argument(
        "--differentiated", action="store_true",
        help="with --docs-only-link-from: differentiated replicas "
             "(unique per-replica token prefix — the near-dup-family "
             "decade recipe; see build_docs_differentiated)",
    )
    ap.add_argument(
        "--docs-only-link-from", metavar="DIR",
        help="build ONLY documents at --replicas (collision guard "
             "waived — plain-corpus queries only) and symlink the "
             "other tables from DIR (the sfx100 recipe, PERF §39)",
    )
    a = ap.parse_args()
    if a.docs_only_link_from:
        if a.differentiated:
            build_docs_differentiated(
                a.src, a.out, a.replicas, a.docs_only_link_from
            )
        else:
            build_docs_only(a.src, a.out, a.replicas, a.docs_only_link_from)
        print(f"built {a.out} documents x{a.replicas} "
              f"(rest linked from {a.docs_only_link_from})")
    else:
        build(a.src, a.out, a.replicas, tpch=a.tpch)
        print(f"built {a.out} from {a.src} x{a.replicas}"
              + (" (+tpch replicas)" if a.tpch else ""))
