"""Local DuckDB-oracle comparison for every registered query — mirrors the
driver's correctness gate (row count + schema width + order-insensitive
value comparison) at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Sort columns by name, round floats, stringify — order-insensitive
    comparable form (mirrors the driver's value-hash)."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append("\x00".join(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )

    def kinds(rows, cols):
        """Per-column type kind (int/float/str/...) from the first
        non-null value — mirrors the driver's schema comparison, which
        the %.6g value normalization would otherwise mask (e.g. Spark
        floor() returns BIGINT where DuckDB's returns DOUBLE)."""
        out = {}
        for i, c in enumerate(cols):
            for row in rows:
                if row[i] is not None:
                    k = type(row[i]).__name__
                    out[c] = {"int": "int", "float": "float"}.get(k, "other")
                    break
        return out

    sk, dk = kinds(spark_rows, spark_cols), kinds(duck_rows, duck_cols)
    diff = {c: (sk.get(c), dk.get(c)) for c in sk if c in dk and sk[c] != dk[c]}
    assert not diff, f"{name}: column type kinds differ: {diff}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    sn = normalize(spark_rows, spark_cols)
    dn = normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY or ["__all_oracle_backed__"])
def test_rows_only_queries_run(spark, name):
    """Weak rows-only gate for queries without an oracle. Currently the
    parameter set is EMPTY by design — every registered query carries a
    DuckDB oracle — so the test degenerates to asserting exactly that."""
    if name == "__all_oracle_backed__":
        assert not ROWS_ONLY
        return
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert df.columns
