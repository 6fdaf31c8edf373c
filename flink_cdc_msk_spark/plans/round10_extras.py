"""Round-10 additions: the Rabin-Karp boundary fast path for
offset-invariant substring dedup (VERDICT r9 "Next round" item 1).

``text_substring_dedup_cdc`` (round 9) pays one md5 — and one
O(position) substring scan — PER CHARACTER for its chunk boundaries:
31.5 s at sfx1 vs the aligned twin's 1.79 s (PERF §31). The boundary
function is a map-side projection, so the fix changes no shuffle:
``text_substring_dedup_rk`` runs the SAME corpus -> chunks -> cross-doc
spans pipeline with the anchor hash swapped for a Rabin-Karp polynomial
window hash evaluated as a batch-vectorized Arrow UDF
(``functions/rolling_hash.py`` — O(1) amortized arithmetic per
character, the whole Arrow batch hashed as one numpy array).

Both boundary modes stay registered: the md5 form is the cross-engine
parity baseline; this form is the 100 TB path. The RK hash is plain
integer arithmetic, so the DuckDB oracle re-derives THESE boundaries
from first principles too (8 explicit polynomial terms in portable
SQL) — the fast path gets a full row/schema/value-hash gate, not a
weaker rows-only check. Anchor positions differ between the modes (by
design — any content-defined hash works); chunk-length distribution
and detection semantics are identical, pinned by the same
unaligned-plant property test.

Reference parity note: the reference repo (yhyyz/flink-cdc-msk) has no
data-curation surface — Part-B capability closure (SURVEY.md §2).
"""

from __future__ import annotations

from ..functions.rolling_hash import (
    RK_M,
    RK_W,
    rk_anchor_filter_duckdb,
)
from .llm_pipeline import _docs_with_near_dups
from .registry import register
from .round9_extras import (
    CDC_M,
    CDC_W,
    _cdc_chunks,
    _cdc_chunks_sql,
    _dup_span_oracle,
    _dup_span_report,
)

# the two boundary modes must chunk at the same window/density for the
# A/B and the shared property tests to be apples-to-apples
assert RK_W == CDC_W and RK_M == CDC_M

_RK_CHUNKS_SQL = _cdc_chunks_sql(rk_anchor_filter_duckdb("i"))


@register(
    "text_substring_dedup_rk",
    oracle=_dup_span_oracle(_RK_CHUNKS_SQL),
)
def text_substring_dedup_rk(spark, sf_dir):
    """Offset-invariant exact-substring dedup, Rabin-Karp boundary mode:
    identical detection contract and shuffle count to
    ``text_substring_dedup_cdc`` (one map-side chunk projection, a
    window over chunk text, a window over doc_id) with the per-character
    md5 replaced by vectorized integer arithmetic — the declared 100 TB
    refinement of the round-9 operator (at 100 TB the boundary function
    dominates; ~10^14 md5 calls become W fused numpy multiply-adds per
    Arrow batch). PERF §33 records the same-corpus A/B."""
    return _dup_span_report(
        _cdc_chunks(_docs_with_near_dups(spark, sf_dir), boundary="rk")
    )
