"""Independent brute-force checks for the round-10 tier-10
(collocations, entropy rate, embedding geometry, sketch merge)
queries.

Same discipline as tests/test_r10a.py: the DuckDB oracles share formula
TEXT with the Spark queries, so the gate can't catch a formula-level
mistake — these tests recompute each statistic from raw sf0.001 rows
in plain Python (independent code path, same math definition).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    c = duckdb.connect()
    rows = c.execute(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    return [(int(d), t, s) for d, t, s in rows]


@pytest.fixture(scope="module")
def embeddings():
    c = duckdb.connect()
    rows = c.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    return [(int(v), list(e)) for v, e in rows]


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_pmi_brute(spark, docs):
    uni: Counter = Counter()
    big: Counter = Counter()
    nb = 0
    for _, t, _ in docs:
        tk = t.strip().lower().split()
        uni.update(tk)
        for i in range(len(tk) - 1):
            big[(tk[i], tk[i + 1])] += 1
            nb += 1
    n = sum(uni.values())
    scored = []
    for (w1, w2), cxy in big.items():
        if cxy < 10:
            continue
        cx, cy = uni[w1], uni[w2]
        pmi = math.floor(
            1_000_000 * math.log(cxy * n * n / (nb * cx * cy))
        )
        ld = math.floor(
            1_000_000
            * (14.0 + math.log(2.0 * cxy / (cx + cy)) / math.log(2.0))
        )
        scored.append((w1, w2, cxy, cx, cy, pmi, ld))
    top = sorted(scored, key=lambda r: (-r[6], r[0], r[1]))[:20]
    got = entry.queries()["pmi_collocations"](spark, SF).collect()
    assert len(got) == len(top)
    for row, exp in zip(got, top):
        assert (
            row.w1,
            row.w2,
            row.pair_count,
            row.count_w1,
            row.count_w2,
            row.pmi_e6,
            row.logdice_e6,
        ) == exp
    # logDice is bounded above by 14
    assert all(r.logdice_e6 <= 14_000_000 for r in got)


def test_entropy_brute(spark, docs):
    u1: Counter = Counter()
    u2: Counter = Counter()
    for _, t, _ in docs:
        if len(t) >= 1:
            u1.update(t[i : i + 1] for i in range(len(t)))
        if len(t) >= 2:
            u2.update(t[i : i + 2] for i in range(len(t) - 1))

    def h(cnt):
        n = sum(cnt.values())
        scl = sum(
            c * math.floor(1_000_000 * math.log(c))
            for c in cnt.values()
        )
        return n, len(cnt), math.floor(
            1_000_000 * math.log(n) - scl / n
        )

    n1, v1, h1 = h(u1)
    n2, v2, h2 = h(u2)
    row = _one(spark, "char_entropy_rate")
    assert (row.n_chars, row.alphabet, row.bigram_types) == (n1, v1, v2)
    assert (row.h1_e6, row.h2_e6) == (h1, h2)
    assert row.cond_h_e6 == h2 - h1
    assert row.branching_factor_e6 == math.floor(
        1_000_000 * math.exp((h2 - h1) / 1_000_000)
    )
    # natural-language structure: conditional entropy strictly below
    # the unigram entropy, branching factor well below the alphabet
    assert 0 < row.cond_h_e6 < h1
    assert row.branching_factor_e6 < v1 * 1_000_000


def test_anisotropy_brute(spark, embeddings):
    n = len(embeddings)
    dim = len(embeddings[0][1])
    comp = [
        [math.floor(v * 1_000_000) for v in vec]
        for _, vec in embeddings
    ]
    s = [sum(c[p] for c in comp) for p in range(dim)]
    mm = sum(x * x for x in s)
    coss, norms = [], []
    for c in comp:
        vm = sum(c[p] * s[p] for p in range(dim))
        vv = sum(x * x for x in c)
        coss.append(
            math.floor(
                1_000_000 * vm / (math.sqrt(vv) * math.sqrt(mm))
            )
        )
        norms.append(math.floor(math.sqrt(vv)))
    row = _one(spark, "embedding_anisotropy_audit")
    assert (row.n_vectors, row.dim) == (n, dim)
    assert row.centroid_norm_e6 == math.floor(math.sqrt(mm)) // n
    assert row.avg_vec_norm_e6 == sum(norms) // n
    assert row.avg_cos_centroid_e6 == _idiv(sum(coss), n)
    assert row.max_cos_centroid_e6 == max(coss)
    assert row.min_cos_centroid_e6 == min(coss)
    # healthy table: no collapse (avg cos well below 1)
    assert row.avg_cos_centroid_e6 < 500_000


def test_kmv_merge_brute(spark):
    k = 64
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT substring(CAST(o_orderdate AS VARCHAR), 1, 7),
          o_custkey
        FROM '{SF}/orders.parquet'
        """
    ).fetchall()
    per_shard: dict[str, set] = {}
    all_keys = set()
    for m, ck in rows:
        per_shard.setdefault(m, set()).add(int(ck))
        all_keys.add(int(ck))

    def h(ck):
        return int(
            hashlib.md5(str(ck).encode()).hexdigest()[:15], 16
        )

    sketches = {
        m: sorted(h(ck) for ck in ks)[:k]
        for m, ks in per_shard.items()
    }
    sum_est = 0
    for m, sk in sketches.items():
        if len(sk) < k:
            sum_est += len(sk)
        else:
            sum_est += _idiv((k - 1) * (1 << 60), sk[-1])
    merged = sorted(set().union(*sketches.values()))[:k]
    if len(merged) < k:
        est = len(merged)
    else:
        est = _idiv((k - 1) * (1 << 60), merged[-1])
    nd = len(all_keys)
    row = _one(spark, "kmv_merge_audit")
    assert (row.n_shards, row.merged_kth_hash) == (
        len(per_shard),
        merged[-1],
    )
    assert row.merged_estimate == est
    assert row.exact_distinct == nd
    assert row.rel_err_e6 == _idiv((est - nd) * 1_000_000, nd)
    assert row.sum_shard_estimates == sum_est
    assert row.duplication_factor_e6 == _idiv(sum_est * 1_000_000, est)
    # the sketch should land within ~4 relative standard errors of
    # exact (1/sqrt(k-2) ~ 12.7% at k=64)
    assert abs(row.rel_err_e6) < 510_000
    # months see overlapping repeat customers, so the per-shard sum
    # overcounts the merged estimate
    assert row.duplication_factor_e6 > 1_000_000
