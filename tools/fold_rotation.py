#!/usr/bin/env python
"""Rotation maintenance helper (the per-round MAINTENANCE note in
__spark_entry__.py, made mechanical).

Reads every CORRECTNESS_r*.json, unions the hash-green names, and
prints:
  1. the green names NOT yet in `_DRIVER_VERIFIED` (formatted for
     pasting into the frozenset),
  2. `_NEW_R*` entries that are now verified (fold them away),
  3. rotation invariants for the CURRENT state: how many registered
     queries have never received a driver row, and whether the front-50
     covers all of them (it must — otherwise a sweep slot is wasted).

Run FIRST thing each round, before touching anything else.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

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

missing = sorted(greens - E._DRIVER_VERIFIED)
print(f"\n--- {len(missing)} green names to ADD to _DRIVER_VERIFIED:")
if missing:
    print(textwrap.fill(
        " ".join(f'"{n}",' for n in missing), width=72,
        initial_indent="        ", subsequent_indent="        "))

for tier_name in ("_NEW_R4", "_NEW_R5", "_NEW_R6"):
    tier = getattr(E, tier_name, ())
    done = [n for n in tier if n in greens]
    if done:
        print(f"--- {tier_name}: {len(done)}/{len(tier)} now verified "
              f"(fold away): {done}")

qs = list(E.queries())
never = [q for q in qs if q not in greens]
front = set(qs[:50])
uncovered = [q for q in never if q not in front]
print(f"\n--- invariants: {len(qs)} registered, {len(never)} never "
      f"driver-green, {len(uncovered)} of those OUTSIDE the front-50"
      + (f" — FIX ROTATION: {uncovered}" if uncovered else " (good)"))
