"""Wall-clock accounting for once-per-(session, sf_dir) staged frames
(r12 round, VERDICT r11 "what's wrong" #3).

The staging plans (plans/corpus_lsh.py, plans/co_purchase.py,
operators/blocking.staged_fuzzy_pairs) ``localCheckpoint`` a shared
frame the first time any consumer asks for it; that build cost lands
inside whichever TIMED query happens to run first (entity_clusters
~10 s cold in BENCH_r11) and later consumers look artificially cheap
(triangle_count 0.68 s warm).  Total suite time was always honest —
the work runs once inside some timed region — but per-query numbers
misattributed ~8-10 s.

This module records each staged build's wall seconds; ``bench.py``
reports the sum as its own ``staging_sec`` line item (additions-only:
no timed query, rep count, or sink changed).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

#: {stage name: build wall seconds}, accumulated per process.  Build
#: cost metadata only — never query results.
STAGING_SEC: dict[str, float] = {}


@contextmanager
def staged_build(name: str):
    """Time one staged-frame build (the once-per-session branch of a
    staging plan — call INSIDE the cache-miss branch only)."""
    t0 = time.time()
    try:
        yield
    finally:
        STAGING_SEC[name] = round(
            STAGING_SEC.get(name, 0.0) + (time.time() - t0), 3
        )
