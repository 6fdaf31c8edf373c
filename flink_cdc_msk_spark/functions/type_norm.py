"""Debezium type-normalization expressions (SURVEY.md A35 / §1.3).

The reference flattens exotic MySQL types to strings/longs before they
enter the pipeline, via a Debezium ``CustomConverter``
(src/main/java/com/aws/analytics/tools/DebeziumConverter.java) plus two
connector options (MySQLCDC2AWSMSK.scala:248-249). This module reproduces
those renderings as pure Catalyst expressions:

  DATE       → "yyyy-MM-dd" string            (DebeziumConverter.java:18,57-67)
  TIME       → nanos-of-day → "HH:mm:ss"      (DebeziumConverter.java:19,68-81)
  DATETIME   → "yyyy-MM-dd HH:mm:ss"; Timestamp values treated as UTC and
               shifted to GMT+8               (DebeziumConverter.java:20,82-105;
               the GMT+8 hardcode at :91-95 is a parameter here, default-
               matching the reference)
  TIMESTAMP  → ISO-8601 @ UTC → same format   (DebeziumConverter.java:96-100)
  DECIMAL    → string  (decimal.handling.mode=string, scala:248)
  BIGINT UNSIGNED → long (bigint.unsigned.handling.mode=long, scala:249)
  unconvertible   → never fail: permissive try-cast with string fallback
                    (DebeziumConverter.java:131-136 logs + toString)

All JVM-side, codegen-friendly — these run per-row in the CDC hot path, so
there is no Python here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's hardcoded rendering zone for DATETIME Timestamp values
#: (DebeziumConverter.java:91-95). Configurable here; default matches.
DEFAULT_RENDER_TZ = "GMT+8"

DATETIME_FMT = "yyyy-MM-dd HH:mm:ss"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def debezium_date(col: Column | str) -> Column:
    """DATE → ``yyyy-MM-dd`` string."""
    return F.date_format(_c(col), "yyyy-MM-dd")


def debezium_time(nanos_of_day: Column | str) -> Column:
    """TIME carried as nanos-of-day (Debezium Duration semantics,
    DebeziumConverter.java:68-81) → ``HH:mm:ss`` string."""
    ns = _c(nanos_of_day)
    s = F.floor(ns / F.lit(1_000_000_000)).cast("long")
    two = lambda x: F.lpad(x.cast("string"), 2, "0")  # noqa: E731
    return F.concat_ws(
        ":",
        two(F.floor(s / 3600)),
        two(F.floor(F.pmod(s, 3600) / 60)),
        two(F.pmod(s, 60)),
    )


def debezium_datetime(
    col: Column | str, render_tz: str = DEFAULT_RENDER_TZ
) -> Column:
    """DATETIME carried as an instant: treated as UTC, shifted to
    ``render_tz`` (reference hardcodes GMT+8), rendered
    ``yyyy-MM-dd HH:mm:ss``."""
    return F.date_format(F.from_utc_timestamp(_c(col), render_tz), DATETIME_FMT)


def debezium_timestamp(col: Column | str) -> Column:
    """TIMESTAMP: ISO-8601 string (or timestamp) parsed as an Instant at
    UTC, rendered ``yyyy-MM-dd HH:mm:ss`` without zone shift
    (DebeziumConverter.java:96-100)."""
    return F.date_format(F.to_timestamp(_c(col)), DATETIME_FMT)


def debezium_decimal(col: Column | str, precision: int = 38, scale: int = 2) -> Column:
    """DECIMAL → exact decimal string (``decimal.handling.mode=string``).
    The cast through DecimalType pins the scale so the rendering is
    deterministic across engines."""
    return _c(col).cast(f"decimal({precision},{scale})").cast("string")


def debezium_unsigned_bigint(col: Column | str) -> Column:
    """BIGINT UNSIGNED → long (``bigint.unsigned.handling.mode=long``)."""
    return _c(col).cast("long")


def permissive_string(col: Column | str, converted: Column) -> Column:
    """Never-fail semantics (DebeziumConverter.java:131-136): if the
    conversion produced null from a non-null input, fall back to the raw
    value's string form (the reference logs and ``toString``s)."""
    raw = _c(col)
    return F.coalesce(converted, raw.cast("string"))
