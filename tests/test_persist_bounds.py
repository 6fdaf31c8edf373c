"""Round-11 materialization-bound pin (VERDICT r10 item 4).

Every ``.persist(`` / ``.localCheckpoint(`` call site in the engine
must name its growth bound in a nearby comment — the word "bound"
within the 8 lines above or 4 lines below the call. PERF §39 showed
why: a materialization that looked corpus-proportional-safe at sf0.1
pinned 4.95M deserialized rows on the heap at sfx100 and OOM'd the
JVM. The bound comment forces the author to state what the cached
relation's size is PROPORTIONAL TO (per-doc reduction, vocab-scale,
|E| edges, time buckets, ...) so a reviewer can check it against the
100 TB target without re-deriving the plan. Adding an unbounded
persist now fails this test instead of failing at the second decade.
"""

from __future__ import annotations

import glob
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "flink_cdc_msk_spark")

BEFORE_LINES = 8
AFTER_LINES = 4


def _sites_missing_bounds():
    missing = []
    for f in glob.glob(os.path.join(ROOT, "**", "*.py"), recursive=True):
        with open(f) as fh:
            lines = fh.readlines()
        for i, line in enumerate(lines):
            code = line.split("#")[0]
            if ".persist(" not in code and ".localCheckpoint(" not in code:
                continue
            window = "".join(
                lines[max(0, i - BEFORE_LINES): i + 1 + AFTER_LINES]
            ).lower()
            if "bound" not in window:
                rel = os.path.relpath(f, ROOT)
                missing.append(f"{rel}:{i + 1}: {line.strip()}")
    return missing


def test_every_persist_site_names_its_growth_bound():
    missing = _sites_missing_bounds()
    assert not missing, (
        "persist/localCheckpoint call sites without a growth-bound "
        "comment (add '# bound: <what the cached size is proportional "
        "to>' within 8 lines above / 4 below):\n" + "\n".join(missing)
    )
