"""Property/brute checks for the round-9 tier-6 text devices."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()


@pytest.fixture(scope="module")
def trigrams(docs):
    out = {}
    for doc_id, _, text in docs:
        tk = re.split(r"\s+", text.strip().lower())
        out[doc_id] = [
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        ]
    return out


def test_novelty_curve_brute(spark, trigrams):
    first = {}
    for d in sorted(trigrams):
        for g in trigrams[d]:
            first.setdefault(g, d)
    lo, hi = min(trigrams), max(trigrams)
    agg = Counter()
    nov = Counter()
    ndoc = Counter()
    for d, gs in trigrams.items():
        dec = min(9, (d - lo) * 10 // (hi - lo + 1))
        agg[dec] += len(gs)
        nov[dec] += sum(1 for g in gs if first[g] == d)
        ndoc[dec] += 1
    rows = entry.queries()["trigram_novelty_curve"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_docs == ndoc[r.decile]
        assert r.n_trigrams == agg[r.decile]
        assert r.n_novel == nov[r.decile]
    # the first decile is, by construction, the most novel
    byd = sorted(rows, key=lambda r: r.decile)
    assert byd[0].novelty_ppm == max(r.novelty_ppm for r in rows)


def test_containment_brute(spark, trigrams):
    sets = {d: set(gs) for d, gs in trigrams.items()}
    df = Counter(g for s in sets.values() for g in s)
    rare = {
        d: {g for g in s if 2 <= df[g] <= 10} for d, s in sets.items()
    }
    pairs = {}
    docs_sorted = sorted(rare)
    inv = {}
    for d, s in rare.items():
        for g in s:
            inv.setdefault(g, []).append(d)
    for g, ds in inv.items():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    expect = {k: v for k, v in pairs.items() if v >= 3}
    rows = entry.queries()["shingle_containment_pairs"](
        spark, SF
    ).collect()
    got = {(r.doc_a, r.doc_b): r.n_shared for r in rows}
    assert got == expect
    for r in rows:
        assert r.n_shared <= min(r.n_rare_a, r.n_rare_b)
        assert (
            r.containment_a_ppm
            == r.n_shared * 1_000_000 // r.n_rare_a
        )
        assert r.max_containment_ppm >= max(
            r.containment_a_ppm, r.containment_b_ppm
        )
    del docs_sorted


def test_fertility_brute(spark, docs):
    words = Counter()
    toks = Counter()
    chars = Counter()
    nd = Counter()
    for _, src, text in docs:
        words[src] += len(re.split(r"\s+", text.strip()))
        toks[src] += len(re.findall(r"[A-Za-z0-9_]+", text)) + len(
            re.findall(r"[^A-Za-z0-9_\s]", text)
        )
        chars[src] += len(text)
        nd[src] += 1
    rows = entry.queries()["tokenizer_fertility_by_source"](
        spark, SF
    ).collect()
    assert {r.source for r in rows} == set(nd)
    for r in rows:
        assert r.n_docs == nd[r.source]
        assert r.n_words == words[r.source]
        assert r.n_tokens == toks[r.source]
        assert r.n_chars == chars[r.source]
        assert (
            r.fertility_ppm
            == toks[r.source] * 1_000_000 // words[r.source]
        )
