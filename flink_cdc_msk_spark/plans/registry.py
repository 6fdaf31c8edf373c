"""Named query registry — the engine's public query surface.

Every operator from SURVEY.md §2 (Part A parity + Part B capability closure
+ LLM-pipeline extensions) is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, an ANSI-SQL
oracle string DuckDB can run over the same parquet tables. The driver
compares the two at sf0.01 (row count + schema + order-insensitive value
hash); pytest does the same locally.

Conventions (driver contract):
  * every computed column is aliased identically in Spark and SQL;
  * floating aggregates are ``round``-ed (2-6 dp) on both sides so the
    value-hash is robust to summation order across partitions;
  * timestamp-derived outputs are formatted to strings so ns/us precision
    differences can't break the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) by name."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side-effect: registry population)."""
    from . import cdc_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import windows_events  # noqa: F401
    from . import llm_pipeline  # noqa: F401
    from . import llm_extras  # noqa: F401
    from . import analytics_extras  # noqa: F401
    from . import analytics_extras2  # noqa: F401
    from . import round5_extras  # noqa: F401
    from . import round6_extras  # noqa: F401
    from . import round7_extras  # noqa: F401
    from . import round8_extras  # noqa: F401
    from . import round9_extras  # noqa: F401
    from . import round10_extras  # noqa: F401
    from . import round10b_extras  # noqa: F401
    from . import round11_extras  # noqa: F401
    from . import round12_extras  # noqa: F401


_loaded = False


def ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        load_all()
        _loaded = True
