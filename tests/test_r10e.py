"""Independent brute-force checks for the round-10 tier-5/6 text and
chunk-dedup queries — plain-Python recomputation from raw sf0.001
documents."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

STOPWORDS = set(
    "the of and to a in is it that for on with as at by an be this "
    "which or from are was not but had his they her she you we".split()
)


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
        " WHERE trim(text) <> ''"
    ).fetchall()
    return [
        (int(d), s, re.split(r"\s+", t.strip().lower()))
        for d, s, t in rows
    ]


def _idiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_kl_brute(spark, docs):
    wc = defaultdict(Counter)
    for _, s, toks in docs:
        wc[s].update(toks)
    corpus = Counter()
    for c in wc.values():
        corpus.update(c)
    vocab = sorted(corpus)
    V, N = len(vocab), sum(corpus.values())
    rows = entry.queries()["kl_source_divergence"](spark, SF).collect()
    got = {r.source: (r.n_tokens, r.kl_microbits) for r in rows}
    assert set(got) == set(wc)
    for s, c in wc.items():
        ns = sum(c.values())
        kl = sum(
            math.floor(
                1e6
                * ((c.get(w, 0) + 1) / (ns + V))
                * math.log2(
                    ((c.get(w, 0) + 1) / (ns + V)) / (corpus[w] / N)
                )
            )
            for w in vocab
        )
        assert got[s] == (ns, kl), s


def test_js_brute(spark, docs):
    wc = defaultdict(Counter)
    for _, s, toks in docs:
        wc[s].update(toks)
    tot = {s: sum(c.values()) for s, c in wc.items()}
    rows = entry.queries()["js_divergence_sources"](spark, SF).collect()
    got = {(r.src_a, r.src_b): r.js_microbits for r in rows}
    srcs = sorted(wc)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            na, nb = tot[a], tot[b]
            shared = set(wc[a]) & set(wc[b])
            ca_sh = sum(wc[a][w] for w in shared)
            cb_sh = sum(wc[b][w] for w in shared)
            sm = 0
            for w in sorted(shared):
                pa, pb = wc[a][w] / na, wc[b][w] / nb
                m = (pa + pb) / 2
                sm += math.floor(5e5 * pa * math.log2(pa / m))
                sm += math.floor(5e5 * pb * math.log2(pb / m))
            js = (
                sm
                + _idiv((na - ca_sh) * 500_000, na)
                + _idiv((nb - cb_sh) * 500_000, nb)
            )
            assert got[(a, b)] == js, (a, b)


def test_msttr_brute(spark, docs):
    per_source = defaultdict(lambda: [0, 0])  # [n_segs, sum_distinct]
    for _, s, toks in docs:
        full = len(toks) // 50
        for g in range(full):
            seg = toks[g * 50 : (g + 1) * 50]
            per_source[s][0] += 1
            per_source[s][1] += len(set(seg))
    rows = entry.queries()["msttr_lexical_diversity"](
        spark, SF
    ).collect()
    got = {r.source: (r.n_segments, r.msttr_e6) for r in rows}
    expect = {
        s: (n, _idiv(v * 1_000_000, n * 50))
        for s, (n, v) in per_source.items()
        if n
    }
    assert got == expect


def test_stopchi_brute(spark, docs):
    o = Counter()
    n = Counter()
    for _, s, toks in docs:
        n[s] += len(toks)
        o[s] += sum(1 for t in toks if t in STOPWORDS)
    N, O, S = sum(n.values()), sum(o.values()), len(n)
    chi2 = sum(
        _idiv(
            (o[s] * N - n[s] * O) ** 2 * 1_000_000, n[s] * O * N
        )
        for s in n
    )
    rows = entry.queries()["stopword_chi2_drift"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_sources, r.n_tokens, r.n_stopwords, r.chi2_e6) == (
        S,
        N,
        O,
        chi2,
    )
    assert r.reject_homogeneity == (chi2 > 30_143_527 and S == 20)


def test_hapax_brute(spark, docs):
    wc = defaultdict(Counter)
    for _, s, toks in docs:
        wc[s].update(toks)
    rows = entry.queries()["hapax_ratio_by_source"](spark, SF).collect()
    got = {
        r.source: (
            r.n_tokens,
            r.vocab,
            r.v1,
            r.v2,
            r.hapax_ratio_e6,
            r.sichel_e6,
            r.honore_e2,
        )
        for r in rows
    }
    for s, c in wc.items():
        nt = sum(c.values())
        v = len(c)
        v1 = sum(1 for x in c.values() if x == 1)
        v2 = sum(1 for x in c.values() if x == 2)
        hon = (
            math.floor(10_000 * math.log(nt) * v / (v - v1))
            if v != v1
            else None
        )
        assert got[s] == (
            nt,
            v,
            v1,
            v2,
            _idiv(v1 * 1_000_000, v),
            _idiv(v2 * 1_000_000, v),
            hon,
        ), s


def test_cdc_brute(spark, docs):
    all_chunks = []
    for _, _, toks in docs:
        chunk = []
        for w in toks:
            chunk.append(w)
            if _md5(w)[0] in ("0", "1"):
                all_chunks.append(chunk)
                chunk = []
        if chunk:
            all_chunks.append(chunk)
    hashes = Counter(_md5(" ".join(c)) for c in all_chunks)
    n_chunks = len(all_chunks)
    n_distinct = len(hashes)
    total_len = sum(len(c) for c in all_chunks)
    r = entry.queries()["cdc_chunk_dedup"](spark, SF).collect()[0]
    assert (r.n_chunks, r.n_distinct_chunks) == (n_chunks, n_distinct)
    assert r.dup_chunk_ppm == _idiv(
        (n_chunks - n_distinct) * 1_000_000, n_chunks
    )
    assert r.top_dup_count == max(hashes.values())
    assert r.mean_chunk_len_e2 == _idiv(total_len * 100, n_chunks)


def test_cdc_resynchronization_property(spark, docs):
    """The defining CDC property: inserting one token shifts only the
    chunk containing the edit (and possibly merges with its left
    neighbour) — every chunk after the next boundary is unchanged."""

    def chunks(toks):
        out, cur = [], []
        for w in toks:
            cur.append(w)
            if _md5(w)[0] in ("0", "1"):
                out.append(tuple(cur))
                cur = []
        if cur:
            out.append(tuple(cur))
        return out

    toks = max((t for _, _, t in docs), key=len)
    assert len(toks) >= 40
    mid = len(toks) // 2
    orig = chunks(toks)
    edited = chunks(toks[:mid] + ["zzinserted"] + toks[mid:])
    # prefix + suffix must re-align around at most 2 disturbed chunks
    j = 0
    while j < min(len(orig), len(edited)) and orig[j] == edited[j]:
        j += 1
    k = 0
    while (
        k < min(len(orig), len(edited)) - j
        and orig[-1 - k] == edited[-1 - k]
    ):
        k += 1
    assert j + k >= len(orig) - 2


def test_cross_source_overlap_brute(spark, docs):
    sh = defaultdict(set)
    for _, s, toks in docs:
        for i in range(len(toks) - 7):
            sh[s].add(_md5(" ".join(toks[i : i + 8])))
    pairs = []
    for a in sorted(sh):
        for b in sorted(sh):
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            if inter:
                pairs.append(
                    (
                        _idiv(inter * 1_000_000, len(sh[a])),
                        a,
                        b,
                        len(sh[a]),
                        inter,
                    )
                )
    pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
    expect = [
        (a, b, nsa, inter, ppm) for ppm, a, b, nsa, inter in pairs[:25]
    ]
    rows = entry.queries()["cross_source_ngram_overlap"](
        spark, SF
    ).collect()
    got = [
        (r.src_a, r.src_b, r.n_shingles_a, r.n_common, r.containment_ppm)
        for r in rows
    ]
    assert got == expect


def test_wdbt_brute(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT date_trunc('hour', ts), event_type, user_id
        FROM '{SF}/events.parquet'
        """
    ).fetchall()
    expect = defaultdict(set)
    for h, et, u in rows:
        expect[(h, et)].add(u)
    got = {
        (r.window_start, r.event_type): r.distinct_users
        for r in entry.queries()["watermark_dedup_batch_twin"](
            spark, SF
        ).collect()
    }
    assert got == {k: len(v) for k, v in expect.items()}
