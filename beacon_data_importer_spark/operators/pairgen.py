"""Arrow pair-expansion kernel for posting lists (r11 optimization
round, guide §2.3/§4.2).

The classic inverted-index pair generator — ``post a JOIN post b ON
a.key = b.key AND a.id < b.id`` followed by a ``GROUP BY (a, b)`` count
— shuffles the raw per-key pair stream into the aggregate exchange.
This module replaces it with ONE key-partitioned ``collect_list`` (an
explicit-width exchange, AQE-exempt so the CPU-heavy expansion stays
parallel) and a ``mapInArrow`` kernel that emits each key's C(m, 2)
ordered pairs PRE-COMBINED per Arrow batch (``np.unique`` with counts),
so the downstream aggregate shuffles partial counts, not pairs.

Exact-integer end-to-end: the pair multiset is identical to the
self-join's, so ``sum(n)`` == the old ``count(*)`` per (a, b) — the
device is A/B-verified value-identical on the co-purchase graph and the
dedup-eval truth join.

100 TB posture: identical key-fan-out bounds as the self-join (work is
Σ C(k_key, 2) either way); per-key buffers are bounded by the hottest
key's posting length, the same quantity that bounds the join's skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ragged_pair_indices(starts, counts):
    """Vectorized C(m, 2) pair indices for RAGGED groups — no per-group
    Python loop (r12: the per-group ``np.triu_indices`` loop dominated
    on many-tiny-group inputs like order baskets, ~30 µs of Python per
    group × 150k groups).  Given group start offsets and sizes, returns
    (ia, ib): absolute indices into the flat value array for every
    within-group ordered pair (i < j), via two integer ``np.repeat``
    levels (group → first index i with multiplicity m−1−i → j)."""
    import numpy as np

    n1 = counts - 1  # per-group count of first-index values
    tot1 = int(n1.sum())
    if tot1 <= 0:
        return None, None
    gi = np.repeat(np.arange(len(counts)), n1)
    i_loc = np.arange(tot1, dtype=np.int64) - np.repeat(
        np.cumsum(n1) - n1, n1
    )
    w = counts[gi] - 1 - i_loc  # number of j's for each (group, i)
    totp = int(w.sum())
    pair_sel = np.repeat(np.arange(tot1), w)
    j_loc = (
        np.arange(totp, dtype=np.int64)
        - np.repeat(np.cumsum(w) - w, w)
        + i_loc[pair_sel]
        + 1
    )
    base = starts[gi[pair_sel]]
    return base + i_loc[pair_sel], base + j_loc


def _gen_pairs(batches):
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        col = batch.column(0)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + len(col) + 1
        ].astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        counts = offs[1:] - offs[:-1]
        keep = counts >= 2
        ia, ib = _ragged_pair_indices(offs[:-1][keep], counts[keep])
        if ia is None:
            continue
        pa_ = vals[ia]
        pb_ = vals[ib]
        if len(pa_) and pa_.max() < (1 << 31) and pb_.max() < (1 << 31):
            # local combine: (a, b) packs into one uint64, so duplicate
            # pairs across keys in this batch ship as one partial count
            # (falls back to raw pairs if ids ever exceed 31 bits)
            k = pa_.astype(np.uint64) << np.uint64(32) | pb_.astype(
                np.uint64
            )
            uk, cnt = np.unique(k, return_counts=True)
            pa_ = (uk >> np.uint64(32)).astype(np.int64)
            pb_ = (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            cnt = np.ones(len(pa_), dtype=np.int64)
        yield pa.record_batch(
            [
                pa.array(pa_.astype(np.int64)),
                pa.array(pb_.astype(np.int64)),
                pa.array(cnt.astype(np.int64)),
            ],
            names=["a", "b", "n"],
        )


def posting_pair_counts(
    post: DataFrame,
    key: str | Column,
    id_col: str | Column,
    repartition: bool = True,
) -> DataFrame:
    """(a, b, i) co-occurrence counts over a postings frame: for every
    pair of distinct ids sharing a key (a < b), ``i`` = number of shared
    keys.  Value-identical to the ``a.key = b.key AND a.id < b.id``
    self-join + count, with the pair stream combined batch-locally
    before the one aggregate exchange.  ``post`` must be unique per
    (key, id) — the caller's distinct/explode contract.  Pass
    ``repartition=False`` when the caller already key-partitioned the
    frame with an explicit width (avoids a redundant exchange)."""
    spark = post.sparkSession
    width = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32") or "32"
    )
    narrowed = post.select(
        F.col(key) if isinstance(key, str) else key,
        (F.col(id_col) if isinstance(id_col, str) else id_col).alias(
            "__pid"
        ),
    )
    if repartition:
        narrowed = narrowed.repartition(
            width, key if isinstance(key, str) else key
        )
    grouped = (
        narrowed.groupBy(key)
        .agg(F.array_sort(F.collect_list("__pid")).alias("__ids"))
        .select("__ids")
    )
    pairs = grouped.mapInArrow(_gen_pairs, "a bigint, b bigint, n bigint")
    return pairs.groupBy("a", "b").agg(
        F.sum("n").cast("bigint").alias("i")
    )
