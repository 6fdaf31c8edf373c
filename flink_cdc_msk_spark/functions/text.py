"""Text-analysis expression helpers (LLM-pipeline surface, SURVEY.md Part B).

All pure Catalyst expressions (JVM-side, codegen-friendly) — token ops use
array functions over ``split``, never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic stopword profile per language. The heuristic is the
# classic stopword-hit-count language guesser; profiles are part of the
# engine (arbitrary but fixed — the oracle uses the same lists).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "la", "les", "et", "est", "de"),
    "es": ("el", "la", "los", "y", "es", "de"),
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(col), " "), lambda t: t != F.lit(""))


def shingles_from_tokens(tok_col: Column, n: int = 3) -> Column:
    """Positional word n-gram shingles (space-joined) from a PRE-MATERIALIZED
    token-array column — the standard dedup unit: far more selective than
    unigrams, so inverted-index joins and MinHash buckets stay small even
    when documents share a vocabulary.

    ``tok_col`` must be a plain attribute reference (a column produced by an
    earlier ``select``), not an inline ``tokens(...)`` expression: lambdas in
    higher-order functions are interpreted (no whole-stage codegen), so an
    inlined tokenizer would be re-evaluated for every ``element_at`` of every
    shingle — O(doc_len²) per row, measured ~14× slower at sf0.1."""
    k = F.size(tok_col) - (n - 1)
    make = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok_col, i + F.lit(j)) for j in range(n)]
        ),
    )
    # sequence(1, k) with k < 1 would count DOWN — guard to empty array
    return F.when(k >= 1, make).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Inline-tokenizing shingles — convenience form. In hot paths prefer
    materializing ``tokens(col)`` into its own projection and calling
    :func:`shingles_from_tokens` (see its performance note)."""
    return shingles_from_tokens(tokens(col), n)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    """# tokens that are in the given stopword list."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(wl, t))
    ).cast("bigint")


def punct_ratio(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(col, PUNCT_CLASS, "")
    return F.round(
        (F.length(col) - F.length(stripped)) / F.length(col), 6
    )


def avg_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / F.size(toks), 4)


def rolling_fingerprint(col: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters: ``h = (31h + cp) % mod``.

    Same recurrence as Java hashCode but in modular space — a cheap
    whole-document fingerprint for exact-dup detection that both Spark
    (aggregate) and DuckDB (list_reduce) can evaluate identically.
    """
    col = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(mod),
    )


def rolling_fingerprint_sql(expr: str, mod: int = 1_000_000_007) -> str:
    """DuckDB oracle for :func:`rolling_fingerprint` over SQL column expr."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_split_to_array({expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % {mod})"
    )


def md5_hash60(col: Column | str) -> Column:
    """Engine-portable 60-bit token hash: the first 15 hex digits of the
    md5 digest, parsed as an integer. md5 is bit-identical everywhere, and
    both Spark (``conv(.., 16, 10)``) and DuckDB (``CAST('0x..' AS
    BIGINT)``) parse the hex prefix exactly — so sketches built on this
    hash (SimHash fingerprints, MinHash signatures) are reproducible
    across engines, which is what makes them ORACLE-CHECKABLE rather than
    rows-only. 60 bits keeps the value inside a signed 64-bit long with
    headroom. Slower than xxhash64 (md5 + string slicing) — use the
    xxhash64 default for production scale, this for verifiability."""
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def md5_hash60_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`md5_hash60` over SQL column expr."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
