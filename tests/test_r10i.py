"""Independent brute-force checks for the round-10 tier-9 (vocabulary
statistics and keyness) queries.

Same discipline as tests/test_r10a.py: the DuckDB oracles share formula
TEXT with the Spark queries, so the gate can't catch a formula-level
mistake — these tests recompute each statistic from raw sf0.001 rows
in plain Python (independent code path, same math definition).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    c = duckdb.connect()
    rows = c.execute(
        f"SELECT doc_id, text, lang, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    return [
        (int(d), t, lang, src)
        for d, t, lang, src in rows
        if t.strip() != ""
    ]


@pytest.fixture(scope="module")
def tokens(docs):
    """(doc_id, lang, source, word) occurrences — the \\s+ lowercase
    split convention (Python str.split == regex \\s+ on trimmed
    text)."""
    out = []
    for d, t, lang, src in docs:
        for w in t.strip().lower().split():
            out.append((d, lang, src, w))
    return out


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _one(spark, name):
    rows = entry.queries()[name](spark, SF).collect()
    assert len(rows) == 1
    return rows[0]


def test_yule_brute(spark, tokens):
    tf = Counter(w for _, _, _, w in tokens)
    n = sum(tf.values())
    sc2 = sum(c * c for c in tf.values())
    row = _one(spark, "yule_k_vocabulary")
    assert (row.n_tokens, row.vocab) == (n, len(tf))
    assert row.yule_k_e6 == _idiv((sc2 - n) * 10_000_000_000, n * n)
    assert row.simpson_repeat_e6 == _idiv(
        (sc2 - n) * 1_000_000, n * (n - 1)
    )
    assert row.yule_k_e6 > 0


def test_honore_sichel_brute(spark, tokens):
    tf = Counter(w for _, _, _, w in tokens)
    n = sum(tf.values())
    v = len(tf)
    v1 = sum(1 for c in tf.values() if c == 1)
    v2 = sum(1 for c in tf.values() if c == 2)
    row = _one(spark, "honore_sichel_richness")
    assert (row.n_tokens, row.vocab, row.hapax, row.dis_legomena) == (
        n,
        v,
        v1,
        v2,
    )
    assert row.honore_r_e6 == math.floor(
        1_000_000 * 100.0 * math.log(n) / (1.0 - v1 / v)
    )
    assert row.sichel_s_e6 == _idiv(v2 * 1_000_000, v)


def test_good_turing_brute(spark, tokens):
    tf = Counter(w for _, _, _, w in tokens)
    n = sum(tf.values())
    spec = Counter(tf.values())
    rows = {
        r.r: (r.n_r, r.r_star_e6)
        for r in entry.queries()["good_turing_smoothing"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    assert rows[0] == (n, _idiv(spec.get(1, 0) * 1_000_000, n))
    for r in range(1, 6):
        nr = spec.get(r, 0)
        nr1 = spec.get(r + 1, 0)
        assert rows[r] == (
            nr,
            _idiv(nr1 * (r + 1) * 1_000_000, nr if nr else 1),
        )
    # Good-Turing signature on an open vocabulary: r*(1) < 1
    assert rows[1][1] < 1_000_000 or spec.get(1, 0) == 0


def test_keyness_brute(spark, tokens):
    a_cnt = Counter(w for _, lang, _, w in tokens if lang == "en")
    b_cnt = Counter(w for _, lang, _, w in tokens if lang != "en")
    na, nb = sum(a_cnt.values()), sum(b_cnt.values())
    g2 = {}
    for w in set(a_cnt) | set(b_cnt):
        a, b = a_cnt.get(w, 0), b_cnt.get(w, 0)
        t = 0.0
        if a > 0:
            t += a * math.log(a * (na + nb) / ((a + b) * na))
        if b > 0:
            t += b * math.log(b * (na + nb) / ((a + b) * nb))
        g2[w] = (math.floor(2_000_000 * t), a, b)
    top = sorted(g2.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    got = entry.queries()["log_likelihood_keyness"](spark, SF).collect()
    assert len(got) == 20
    for row, (w, (g, a, b)) in zip(got, top):
        assert (row.term, row.count_en, row.count_rest, row.g2_e6) == (
            w,
            a,
            b,
            g,
        )
        assert row.overused_in_en == (a * nb > b * na)
    # the top English-keyed terms should be overwhelmingly en-side
    assert sum(1 for r in got if r.overused_in_en is not None) == 20


def test_gries_dp_brute(spark, tokens):
    ws = Counter((w, s) for _, _, s, w in tokens)
    srctot = Counter(s for _, _, s, _ in tokens)
    n = sum(srctot.values())
    wt = Counter(w for _, _, _, w in tokens)
    dp = {}
    for w, ct in wt.items():
        if ct < 30:
            continue
        dev = 0
        ns_present = 0
        for s, ns in srctot.items():
            c = ws.get((w, s), 0)
            if c:
                dev += abs(c * n - ct * ns)
                ns_present += ns
        dev += ct * (n - ns_present)
        dp[w] = _idiv(dev * 1_000_000, 2 * ct * n)
    top = sorted(dp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = entry.queries()["gries_dp_dispersion"](spark, SF).collect()
    assert len(got) == 20
    for row, (w, d) in zip(got, top):
        assert (row.term, row.dp_e6) == (w, d)
        assert row.total_count == wt[w]


def test_repetition_brute(spark, docs):
    mx_tot = []
    for d, t, _, _ in docs:
        tk = t.strip().lower().split()
        if len(tk) < 2:
            continue
        bg = Counter(
            f"{tk[i]} {tk[i + 1]}" for i in range(len(tk) - 1)
        )
        mx_tot.append((max(bg.values()), sum(bg.values())))
    n_docs = len(mx_tot)
    smx = sum(m for m, _ in mx_tot)
    stot = sum(t for _, t in mx_tot)
    row = _one(spark, "repetition_ngram_ratio")
    assert row.n_docs == n_docs
    assert row.micro_avg_rep_e6 == _idiv(smx * 1_000_000, stot)
    assert row.docs_over_20pct == sum(
        1 for m, t in mx_tot if m * 5 > t
    )
    assert row.worst_doc_rep_e6 == max(
        _idiv(m * 1_000_000, t) for m, t in mx_tot
    )
