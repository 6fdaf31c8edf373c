"""Rabin-Karp window-hash anchor function — the 100 TB boundary fast
path for content-defined chunking (VERDICT r9 item 1).

The round-9 chunker (``plans/round9_extras._cdc_chunks``) anchors a
chunk boundary at every position whose trailing W-char window hashes to
0 mod M. The md5-parity form is portable SQL (DuckDB re-derives the
boundaries from first principles) but pays one cryptographic hash — and
one O(position) UTF8String substring scan — PER CHARACTER: 31.5 s at
sfx1 vs the aligned twin's 1.79 s (PERF §31); at 100 TB the boundary
function IS the operator.

This module replaces md5 with the classic Rabin-Karp polynomial window
hash (public-domain algorithm — Karp & Rabin 1987; the rolling-hash
idea behind LBFS/FastCDC chunking):

    h(i) = sum_{j=0..W-1} cp[i-W+j] * B^(W-1-j)   (mod P)
    anchor at i  <=>  h(i) % M == 0

with cp = Unicode code points, B = 257, P = 1048573 (prime), W/M from
the chunker. Evaluation is an Arrow-batched pandas UDF: the whole batch
of documents is concatenated into ONE numpy code-point array (utf-32
encode = vectorized ``ord``), the hash of every window in the batch is
computed with W fused vectorized multiply-adds (O(1) amortized
arithmetic per character — no md5, no per-position substring, no
per-document Python loop), and cross-document windows are masked out by
offset arithmetic. Map-side only: swapping this in changes no shuffle.

The SAME hash is expressible in portable SQL (8 ``ascii(substr(...))``
terms — O(W) per position is fine for an sf0.01 oracle), so the fast
path gets its own fully oracle-checked registered query
(``text_substring_dedup_rk``) rather than a weaker rows-only check;
``rk_anchors_py`` is the independent pure-Python reference the
boundary-equality property tests pin both engines against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

RK_W = 8  # anchor window (chars) — matches round9_extras.CDC_W
RK_M = 32  # anchor modulus (expected chunk length) — matches CDC_M
RK_B = 257  # polynomial base (> any code point's low byte; coprime to P)
RK_P = 1_048_573  # prime modulus < 2^20: 8 terms sum < 2^23, no overflow
RK_POW = [pow(RK_B, j, RK_P) for j in range(RK_W)]  # B^j mod P


def rk_anchors_py(text: str) -> list[int]:
    """Pure-Python reference (test oracle): 1-based end positions i in
    [W, len] whose trailing W-char window hashes to 0 mod M. O(n*W) —
    clarity over speed; the property tests pin the numpy batch form and
    the DuckDB SQL form against this."""
    n = len(text)
    out = []
    for i in range(RK_W, n + 1):
        h = 0
        for j in range(RK_W):
            h = (h + ord(text[i - RK_W + j]) * RK_POW[RK_W - 1 - j]) % RK_P
        if h % RK_M == 0:
            out.append(i)
    return out


def _rk_anchor_lists(texts: list) -> list[list[int]]:
    """Vectorized batch form: one concatenated code-point array for the
    whole Arrow batch, W fused multiply-adds for every window hash at
    once, cross-document windows masked by offset arithmetic. Returns
    one ascending anchor list (1-based window-end positions) per text."""
    n_docs = len(texts)
    safe = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in safe), dtype=np.int64, count=n_docs)
    total = int(lens.sum())
    if total < RK_W:
        return [[] for _ in safe]
    blob = "".join(safe)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    n_win = total - RK_W + 1
    h = np.zeros(n_win, dtype=np.int64)
    for j in range(RK_W):
        # each term < P < 2^20; the 8-term sum < 2^23 — exact in int64
        h += (cp[j : n_win + j] * RK_POW[RK_W - 1 - j]) % RK_P
    h %= RK_P
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    win_start = np.nonzero(h % RK_M == 0)[0]
    doc_idx = np.searchsorted(starts, win_start, side="right") - 1
    local_end = win_start - starts[doc_idx] + RK_W  # 1-based end position
    keep = local_end <= lens[doc_idx]  # drop windows straddling two docs
    doc_idx, local_end = doc_idx[keep], local_end[keep]
    cuts = np.searchsorted(doc_idx, np.arange(1, n_docs))
    return [a.tolist() for a in np.split(local_end, cuts)]


_RK_UDF = None


def rk_anchors(col):
    """Column -> array<bigint> of anchor positions. The pandas UDF is
    built lazily (DDL-string return types need an active session)."""
    global _RK_UDF
    if _RK_UDF is None:

        @F.pandas_udf("array<bigint>")
        def _udf(texts: pd.Series) -> pd.Series:
            return pd.Series(
                _rk_anchor_lists(texts.tolist()), index=texts.index
            )

        _RK_UDF = _udf
    return _RK_UDF(col)


def rk_byte_anchors_py(payload: bytes, modulus: int = RK_M) -> list[int]:
    """Pure-Python reference for the BYTE-stream variant (binary media
    payloads): identical polynomial over raw byte values instead of
    code points. For ASCII payloads the two variants produce identical
    anchors (byte value == code point), which is what lets the DuckDB
    oracle re-derive byte-mode boundaries with character arithmetic."""
    n = len(payload)
    out = []
    for i in range(RK_W, n + 1):
        h = 0
        for j in range(RK_W):
            h = (h + payload[i - RK_W + j] * RK_POW[RK_W - 1 - j]) % RK_P
        if h % modulus == 0:
            out.append(i)
    return out


def _rk_byte_anchor_lists(
    payloads: list, modulus: int = RK_M
) -> list[list[int]]:
    """Vectorized batch form over binary payloads — same concatenated-
    array trick as ``_rk_anchor_lists`` with ``np.frombuffer(uint8)``
    replacing the utf-32 decode."""
    n_docs = len(payloads)
    safe = [b"" if p is None else bytes(p) for p in payloads]
    lens = np.fromiter((len(p) for p in safe), dtype=np.int64, count=n_docs)
    total = int(lens.sum())
    if total < RK_W:
        return [[] for _ in safe]
    cp = np.frombuffer(b"".join(safe), dtype=np.uint8).astype(np.int64)
    n_win = total - RK_W + 1
    h = np.zeros(n_win, dtype=np.int64)
    for j in range(RK_W):
        h += (cp[j : n_win + j] * RK_POW[RK_W - 1 - j]) % RK_P
    h %= RK_P
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    win_start = np.nonzero(h % modulus == 0)[0]
    doc_idx = np.searchsorted(starts, win_start, side="right") - 1
    local_end = win_start - starts[doc_idx] + RK_W
    keep = local_end <= lens[doc_idx]
    doc_idx, local_end = doc_idx[keep], local_end[keep]
    cuts = np.searchsorted(doc_idx, np.arange(1, n_docs))
    return [a.tolist() for a in np.split(local_end, cuts)]


_RK_BYTE_UDFS: dict[int, object] = {}


def rk_byte_anchors(col, modulus: int = RK_M):
    """Binary column -> array<bigint> of anchor positions (1-based byte
    offsets of window ends). ``modulus`` sets the expected chunk length
    in bytes; one UDF is built (lazily) per modulus."""
    udf = _RK_BYTE_UDFS.get(modulus)
    if udf is None:

        @F.pandas_udf("array<bigint>")
        def _udf(payloads: pd.Series) -> pd.Series:
            return pd.Series(
                _rk_byte_anchor_lists(payloads.tolist(), modulus),
                index=payloads.index,
            )

        _RK_BYTE_UDFS[modulus] = udf = _udf
    return udf(col)


def rk_anchor_filter_duckdb(
    pos_var: str = "i", modulus: int = RK_M, text_col: str = "text"
) -> str:
    """The anchor predicate as a DuckDB lambda body over position
    ``i`` (1-based window end) and ``text_col`` — the oracle-side
    mirror of the numpy hash, written as W explicit polynomial terms.
    With a non-default ``modulus`` it also mirrors the BYTE variant on
    ASCII payloads (byte value == code point there)."""
    # power B^j multiplies the char j positions left of the window end
    # (1-based position i - j): h = sum_j cp[i - j] * B^j  ==  the
    # leftmost char (i - W + 1) at B^(W-1), matching rk_anchors_py
    terms = " + ".join(
        f"(ascii(substr({text_col}, CAST({pos_var} - {j} AS INT), 1))"
        f" * {RK_POW[j]}) % {RK_P}"
        for j in range(RK_W)
    )
    return f"({terms}) % {RK_P} % {modulus} = 0"
