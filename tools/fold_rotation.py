#!/usr/bin/env python
"""Rotation invariant checker.

Since round 6 the rotation in __spark_entry__.py is DATA-DRIVEN: each
query's front-50 rank derives from the CORRECTNESS_r*.json files (never
driver-green first, then stalest last-green round).  There is no
frozenset to maintain any more — this tool just verifies the invariants
the driver gate depends on:

  1. every CORRECTNESS file's red rows (investigate any),
  2. how many registered queries have never received a driver row and
     whether the front-50 covers ALL of them (it must),
  3. the front-50 composition by last-green round (staleness actually
     rotating).

Run FIRST thing each round.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as E  # noqa: E402

greens: set[str] = set()
for path in sorted(glob.glob(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "CORRECTNESS_r*.json")
)):
    rows = json.load(open(path))
    greens |= {n for n, r in rows.items() if r.get("hash_match")}
    reds = [n for n, r in rows.items() if not r.get("hash_match")]
    print(f"{os.path.basename(path)}: {len(rows)} rows, "
          f"{len(rows) - len(reds)} green"
          + (f", RED: {reds}" if reds else ""))

qs = list(E.queries())
last = E._last_green_rounds()
never = [q for q in qs if q not in greens]
front = qs[:50]
uncovered = [q for q in never if q not in set(front)]
print(f"\n--- invariants: {len(qs)} registered, {len(never)} never "
      f"driver-green, {len(uncovered)} of those OUTSIDE the front-50"
      + (f" — FIX ROTATION: {uncovered}" if uncovered else " (good)"))
print("--- front-50 by last-green round:",
      dict(sorted(Counter(last.get(n) for n in front).items(),
                  key=lambda t: (t[0] is not None, t[0]))))
oq = list(E.oracle_sql())
print("--- queries()/oracle_sql() order identical:",
      qs == oq or f"MISMATCH at {next(i for i,(a,b) in enumerate(zip(qs,oq)) if a!=b)}")
