"""Java ``String.hashCode`` parity as a pure Catalyst expression.

The reference's Kafka partitioner is
``Math.abs(partitionKey.hashCode % partitions.length)``
(partitioner/FlinkCDCSimplePartitioner.scala:11-15). Same-key→same-partition
(the actual ordering invariant, reference README.md:6) would hold with
Kafka's own murmur2 keying; this expression exists for *partition-number
parity* with the reference.

Implemented with ``aggregate`` over the character array — stays JVM-side
inside whole-stage codegen, no Python round-trip. Arithmetic is done in
LongType with an explicit wrap to int32 each step because Spark 4 runs in
ANSI mode (integer overflow would raise, while Java wraps silently).

Caveat (documented): ``ascii()`` yields the Unicode code point, which equals
the UTF-16 code unit only inside the BMP; partition keys are
``db.table.pk…`` strings, ASCII in every reference example.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO_31 = 2**31
_TWO_32 = 2**32


def java_string_hashcode(col: Column | str) -> Column:
    """``h = 31*h + c`` over chars, int32 wraparound, as LongType column."""
    col = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    step = lambda acc, c: (  # noqa: E731
        F.pmod(acc * F.lit(31) + F.ascii(c) + F.lit(_TWO_31), F.lit(_TWO_32))
        - F.lit(_TWO_31)
    )
    return F.aggregate(chars, F.lit(0).cast("long"), step)


def java_partition(key: Column | str, num_partitions: int) -> Column:
    """``Math.abs(key.hashCode % n)`` — the reference partitioner, bug-fixed.

    The reference crashes once in 2^32: ``Math.abs(Integer.MIN_VALUE)`` is
    negative (SURVEY.md §2 bug note). For every other hash value
    ``pmod(abs(h) % n)``-style arithmetic below is IDENTICAL to Java's
    ``Math.abs(h % n)``; for MIN_VALUE it returns the non-crashing
    ``pmod`` value instead of a negative partition.
    """
    h = java_string_hashcode(key)
    # Java % keeps the dividend's sign; abs() of the long result is safe
    # (no long overflow since |h| <= 2^31). Matches Math.abs(h % n) for all
    # h except MIN_VALUE-where-reference-crashes, handled via pmod fallback.
    raw = F.abs(h % F.lit(num_partitions))
    return F.when(
        h == F.lit(-_TWO_31), F.pmod(h, F.lit(num_partitions))
    ).otherwise(raw).cast("int")


def java_string_hashcode_py(s: str) -> int:
    """Driver/test-side reference implementation (pure Python)."""
    h = 0
    for ch in s:
        for unit in _utf16_units(ch):
            h = (h * 31 + unit) & 0xFFFFFFFF
    return h - _TWO_32 if h >= _TWO_31 else h


def java_partition_py(s: str, n: int) -> int:
    """Driver/test-side ``Math.abs(hashCode % n)`` with Java ``%``
    semantics (remainder keeps dividend sign) + the pmod MIN_VALUE fix."""
    h = java_string_hashcode_py(s)
    if h == -_TWO_31:
        return h % n  # python % = pmod
    rem = h - int(h / n) * n  # Java-style truncated division remainder
    return abs(rem)


def _utf16_units(ch: str) -> list[int]:
    cp = ord(ch)
    if cp < 0x10000:
        return [cp]
    cp -= 0x10000
    return [0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)]
