"""Exactness and strategy tests for operators/blocking.py.

The load-bearing claim is COMPLETENESS: segment blocking must produce
the IDENTICAL pair set as the exhaustive verify for any input — five ER
queries' driver oracles assume it.  Tested against the real testdata
(nation-coarse, the driver-gate semantics) and randomized mutated
strings covering indels, substitutions, varying lengths, and
shorter-than-k+1 strings.
"""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from beacon_data_importer_spark.operators.blocking import (
    blocking_cost_estimates,
    candidate_pairs,
    coarse_blocked_pairs,
    dataset_prefix_len,
    segment_blocked_pairs,
    staged_fuzzy_pairs,
)


def _lev(a: str, b: str) -> int:
    """Plain-Python Levenshtein — the INDEPENDENT reference for the
    exhaustive oracle.  (The earlier oracle ran Spark's own
    bounded_levenshtein over a crossJoin: Spark checked against Spark,
    and the giant banded-DP codegen made each blocking test 10-18 s —
    VERDICT r6 item 8.  bounded_levenshtein's own exactness is covered
    separately in test_expressions.)"""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _exhaustive(df, idc, nc, k, coarse=None):
    """All (a, b, dist) pairs with dist ≤ k, a < b, within the coarse
    group if given — computed driver-side in pure Python (the inputs
    are test-sized by construction)."""
    from collections import defaultdict

    cols = ([coarse] if coarse else []) + [idc, nc]
    groups = defaultdict(list)
    for r in df.select(*cols).collect():
        key = r[0] if coarse else None
        groups[key].append((r[idc], r[nc]))
    out = set()
    for g in groups.values():
        g.sort()
        for i in range(len(g)):
            a, na = g[i]
            for j in range(i + 1, len(g)):
                b, nb = g[j]
                if abs(len(na) - len(nb)) > k:
                    continue
                d = _lev(na, nb)
                if d <= k:
                    out.add((a, b, d))
    return out


def _pairs(df):
    if isinstance(df, set):  # already a Python oracle result
        return df
    return set(map(tuple, df.collect()))


def _mutate(s: str, n: int, rng: random.Random) -> str:
    for _ in range(n):
        op = rng.choice("ids")
        pos = rng.randrange(max(1, len(s) + (1 if op == "i" else 0)))
        ch = rng.choice(string.ascii_lowercase[:6])
        if op == "i":
            s = s[:pos] + ch + s[pos:]
        elif op == "d" and s:
            s = s[:pos] + s[pos + 1 :]
        else:
            s = (s[:pos] + ch + s[pos + 1 :]) if s else ch
    return s


def test_dataset_prefix_len(spark):
    df = spark.createDataFrame(
        [(1, "Customer#0001"), (2, "Customer#0xyz"), (3, "Customer#0zzz")],
        ["id", "name"],
    )
    assert dataset_prefix_len(df, "name") == 10
    one = spark.createDataFrame([(1, "solo")], ["id", "name"])
    assert dataset_prefix_len(one, "name") == 4


def test_segment_blocking_exact_on_testdata(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = _pairs(
        segment_blocked_pairs(
            cust, "c_custkey", "c_name", k=2, coarse_key="c_nationkey"
        )
    )
    want = _pairs(_exhaustive(cust, "c_custkey", "c_name", 2, "c_nationkey"))
    assert got == want and len(want) > 0


@pytest.mark.parametrize("k", [1, 2, 3])
def test_segment_blocking_exact_on_random_mutations(spark, k):
    rng = random.Random(1000 + k)
    rows = []
    for i in range(150):
        base = "".join(
            rng.choice(string.ascii_lowercase[:6])
            for _ in range(rng.randrange(3, 12))
        )
        rows.append((2 * i, base))
        rows.append((2 * i + 1, _mutate(base, rng.randrange(0, k + 2), rng)))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = _pairs(segment_blocked_pairs(df, "id", "name", k=k))
    want = _pairs(_exhaustive(df, "id", "name", k))
    assert got == want and len(want) > 0


def test_segment_blocking_exact_on_short_strings(spark):
    # strings shorter than k+1 produce zero-length segments; exactness
    # must survive (empty-segment keys just widen candidates)
    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randrange(0, 4))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = _pairs(segment_blocked_pairs(df, "id", "name", k=2))
    want = _pairs(_exhaustive(df, "id", "name", 2))
    assert got == want


def test_strategies_agree_and_auto_picks_coarse_on_digit_names(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    seg = _pairs(
        candidate_pairs(
            cust, "c_custkey", "c_name", coarse_key="c_nationkey",
            strategy="segment",
        )
    )
    coarse = _pairs(
        candidate_pairs(
            cust, "c_custkey", "c_name", coarse_key="c_nationkey",
            strategy="coarse",
        )
    )
    auto = _pairs(
        candidate_pairs(
            cust, "c_custkey", "c_name", coarse_key="c_nationkey",
            strategy="auto",
        )
    )
    assert seg == coarse == auto
    # Customer#%09d digits carry no segment entropy -> the estimates
    # must NOT favor segments here (the honest PassJoin negative)
    coarse_est, seg_est = blocking_cost_estimates(
        cust, "c_name", k=2, coarse_key="c_nationkey"
    )
    assert seg_est * 4 >= coarse_est


def test_auto_picks_segment_on_entropy_names(spark):
    rng = random.Random(99)
    rows = []
    for i in range(400):
        base = "".join(rng.choice(string.ascii_lowercase) for _ in range(10))
        rows.append((2 * i, base, i % 25))
        rows.append((2 * i + 1, _mutate(base, 1, rng), i % 25))
    df = spark.createDataFrame(rows, ["id", "name", "ck"])
    coarse_est, seg_est = blocking_cost_estimates(df, "name", k=2, coarse_key="ck")
    assert seg_est * 4 < coarse_est  # auto would choose segments


def test_bad_strategy_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ValueError):
        candidate_pairs(df, "id", "name", strategy="nope")


def test_staged_pairs_cached_per_session(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = staged_fuzzy_pairs(
        spark, cust, "c_custkey", "c_name", coarse_key="c_nationkey",
        stage_key="t1",
    )
    b = staged_fuzzy_pairs(
        spark, cust, "c_custkey", "c_name", coarse_key="c_nationkey",
        stage_key="t1",
    )
    assert a is b  # second call returns the SAME materialized frame
    c = staged_fuzzy_pairs(
        spark, cust, "c_custkey", "c_name", coarse_key="c_nationkey",
        stage_key="t2",
    )
    assert c is not a
    assert _pairs(a.select("a", "b", "edit_dist")) == _pairs(
        coarse_blocked_pairs(
            cust, "c_custkey", "c_name", k=2, coarse_key="c_nationkey"
        )
    )


def test_unblocked_cross_join_guard(spark):
    """VERDICT r4 item 7: the no-coarse_key arm refuses a quadratic
    cross join beyond max_unblocked_rows, and the error names the
    escape hatches; a small input (or an explicitly raised limit)
    still runs."""
    big = spark.range(10_001).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    with pytest.raises(ValueError, match="cross-join.*coarse_key"):
        coarse_blocked_pairs(big, "id", "name", k=1)
    small = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "xyz")], ["id", "name"]
    )
    got = _pairs(coarse_blocked_pairs(small, "id", "name", k=1))
    assert got == {(1, 2, 1)}
    with pytest.raises(ValueError, match="max_unblocked_rows"):
        coarse_blocked_pairs(
            small, "id", "name", k=1, max_unblocked_rows=2
        )
    # a coarse key bypasses the guard entirely (equi-join, not cross)
    keyed = big.withColumn("ck", F.col("id") % 5000)
    coarse_blocked_pairs(keyed, "id", "name", k=1, coarse_key="ck")
