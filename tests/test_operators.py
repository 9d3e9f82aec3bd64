"""Operator-level tests: dedup (first-wins, exact, minhash, simhash),
flatMap, union-by-name, surrogate ids, update-from, similarity, text."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from beacon_data_importer_spark.operators import dedup as DD
from beacon_data_importer_spark.operators import multimodal as MM
from beacon_data_importer_spark.operators import similarity as SIM
from beacon_data_importer_spark.operators import text as TX
from beacon_data_importer_spark.operators.flatmap import explode_counted
from beacon_data_importer_spark.operators.setops import union_by_name
from beacon_data_importer_spark.operators.surrogate import assign_surrogate_ids
from beacon_data_importer_spark.operators.upsert import update_from


def test_first_wins_keeps_first_by_order(spark):
    df = spark.createDataFrame(
        [Row(k="a", seq=2, v="late"), Row(k="a", seq=1, v="early"), Row(k="b", seq=5, v="only")]
    )
    out = {r.k: r.v for r in DD.first_wins(df, "k", ["seq"]).collect()}
    assert out == {"a": "early", "b": "only"}


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="same"), Row(id=2, t="same"), Row(id=3, t="other")]
    )
    out = {r.content_hash: (r.keep_id, r.dup_count) for r in DD.exact_dedup(df, "t", "id").collect()}
    assert out[hashlib.md5(b"same").hexdigest()] == (1, 2)
    assert out[hashlib.md5(b"other").hexdigest()] == (3, 1)


def _py_minhash(shingles, num_hashes):
    xs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DD.MINHASH_P for g in shingles]
    ys = [int(hashlib.md5(g.encode()).hexdigest()[15:30], 16) % DD.MINHASH_P for g in shingles]
    sig = []
    for s, (a, b) in enumerate(DD.minhash_coeffs(num_hashes)):
        sig.append(min((a * x + b * y + s) % DD.MINHASH_P for x, y in zip(xs, ys)))
    return sig


def test_minhash_signature_matches_python(spark):
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([Row(id=1, t=text)])
    sig = DD.minhash_signatures(df, "t", "id", num_hashes=4).collect()[0].sig
    toks = text.lower().split()
    shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    assert sig == _py_minhash(shingles, 4)


def test_minhash_short_doc_fallback(spark):
    df = spark.createDataFrame([Row(id=1, t="two words")])
    sig = DD.minhash_signatures(df, "t", "id", num_hashes=2).collect()[0].sig
    assert sig == _py_minhash(["two words"], 2)


def test_minhash_near_dup_finds_identical_docs(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t), Row(doc_id=3, text="totally different words here completely")]
    )
    sigs = DD.minhash_signatures(df, "text", "doc_id", 16)
    pairs = DD.lsh_candidate_pairs(sigs, 4, 4)
    sim = DD.minhash_similarity(pairs, sigs).collect()
    assert len(sim) == 1
    assert (sim[0].id_a, sim[0].id_b) == (1, 2)
    assert sim[0].est_jaccard == 1.0


def test_minhash_xxhash64_production_path(spark):
    """hash_fn='xxhash64' (the opt-in production path — no oracle twin,
    DuckDB lacks xxhash64) must behave as the same LSH family: valid
    bounded signatures, identical candidate-pair decisions on docs with
    identical / disjoint shingle sets, and a clear error on an unknown
    hash name."""
    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=t),
            Row(doc_id=2, text=t),
            Row(doc_id=3, text="totally different words here completely"),
        ]
    )
    sigs = DD.minhash_signatures(df, "text", "doc_id", 16, hash_fn="xxhash64")
    rows = sigs.collect()
    assert all(
        len(r.sig) == 16 and all(0 <= v < DD.MINHASH_P for v in r.sig)
        for r in rows
    )
    by_id = {r.id: r.sig for r in rows}
    assert by_id[1] == by_id[2]  # identical text -> identical signature
    assert by_id[1] != by_id[3]
    pairs = DD.lsh_candidate_pairs(sigs, 4, 4).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    with pytest.raises(ValueError):
        DD.minhash_signatures(df, "text", "doc_id", hash_fn="sha1")


def _simhash64_reference(text):
    """Superseded 60-traversal column form of SimHash, kept ONLY as the
    independent parity reference for :func:`simhash_agg` (one md5 + one
    bit-vote pass per bit).  Removed from the public API once the
    one-pass fold replaced it (tools/simhash_onepass_probe.py)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    pows = F.array(*[F.lit(1 << i).cast("bigint") for i in range(60)])
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.element_at(pows, b + 1)) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(59)),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc
        + F.when(
            F.element_at(bit_votes, b + 1) > 0, F.element_at(pows, b + 1)
        ).otherwise(F.lit(0).cast("bigint")),
    )


def test_simhash_agg_matches_column_form(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="spark data engine"), Row(id=2, t="completely other words")]
    )
    agg = {r.id: r.simhash for r in DD.simhash_agg(df, "t", "id").collect()}
    col = {
        r.id: r.sh
        for r in df.select("id", _simhash64_reference(F.col("t")).alias("sh")).collect()
    }
    assert agg == col


def test_explode_counted_zero_drops_row(spark):
    df = spark.createDataFrame([Row(k="a", n=2), Row(k="b", n=0), Row(k="c", n=1)])
    out = [(r.k, r.attempt_number) for r in explode_counted(df, F.col("n"), ["k"]).collect()]
    assert sorted(out) == [("a", 1), ("a", 2), ("c", 1)]


def test_union_by_name_pads_missing(spark):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(x=2, z="b")])
    out = union_by_name([a, b]).orderBy("x").collect()
    assert out[0].y == "a" and out[0].z is None
    assert out[1].y is None and out[1].z == "b"


def test_surrogate_ids_dense_and_deterministic(spark):
    df = spark.createDataFrame([Row(k="b"), Row(k="a"), Row(k="c")])
    out = {r.k: r.id for r in assign_surrogate_ids(df, ["k"], start_after=100).collect()}
    assert out == {"a": 101, "b": 102, "c": 103}


def test_surrogate_ids_scalable_unique_dense_jvm_side(spark):
    import inspect

    from beacon_data_importer_spark.operators.surrogate import (
        assign_surrogate_ids_scalable,
    )

    df = spark.range(0, 10_000).repartition(16).select(F.col("id").alias("k"))
    out = assign_surrogate_ids_scalable(df, start_after=50)
    ids = [r.id for r in out.select("id").collect()]
    # unique AND dense: exactly start_after+1 .. start_after+n
    assert sorted(ids) == list(range(51, 10_051))
    # keys survive untouched
    assert sorted(r.k for r in out.collect()) == list(range(10_000))
    # the point of the rewrite: no .rdd round-trip (rows stay JVM-side)
    import ast
    import textwrap

    tree = ast.parse(
        textwrap.dedent(inspect.getsource(assign_surrogate_ids_scalable))
    ).body[0]
    code_only = "\n".join(ast.unparse(stmt) for stmt in tree.body[1:])
    assert ".rdd" not in code_only


def test_surrogate_ids_scalable_empty_frame(spark):
    from beacon_data_importer_spark.operators.surrogate import (
        assign_surrogate_ids_scalable,
    )

    df = spark.range(0, 0).select(F.col("id").alias("k"))
    assert assign_surrogate_ids_scalable(df).count() == 0


def test_update_from_coalesce_keeps_old_on_null(spark):
    target = spark.createDataFrame([Row(k=1, v="old1"), Row(k=2, v="old2")])
    staging = spark.createDataFrame(
        [Row(k=1, v=None, seq=1), Row(k=1, v="newer", seq=2), Row(k=3, v="x", seq=1)]
    )
    out = {
        r.k: r.v
        for r in update_from(
            target, staging, "k", ["v"], [F.col("seq").desc()]
        ).collect()
    }
    # k=1: first-wins under seq DESC picks 'newer'; k=2 untouched
    assert out == {1: "newer", 2: "old2"}


def test_cosine_topk_self_similarity(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 1.0]),
        Row(vec_id=3, embedding=[0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows)
    out = sorted(
        SIM.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect(),
        key=lambda r: -r.cosine_sim_e6,
    )
    assert [r.neighbor_id for r in out] == [1, 3]
    assert out[0].cosine_sim_e6 in (999999, 1000000)  # floor at representation edge


def test_cosine_topk_is_per_query(spark):
    """k rows for EVERY query vector — the round-1 global-limit bug
    returned k rows total, all from one query_id."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.1]),
        Row(vec_id=2, embedding=[0.0, 1.0]),
        Row(vec_id=3, embedding=[0.1, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    out = SIM.cosine_topk(df, df.filter(F.col("vec_id").isin(0, 2)), k=2).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(by_q) == {0, 2}
    assert all(len(v) == 2 for v in by_q.values())
    # nearest neighbor of 0 is 1; of 2 is 3 (and never the query itself)
    assert 1 in by_q[0] and 0 not in by_q[0]
    assert 3 in by_q[2] and 2 not in by_q[2]


def test_text_metrics(spark):
    df = spark.createDataFrame([Row(t="The cat, and a dog!")])
    r = df.select(
        TX.token_count_ws("t").alias("ws"),
        TX.token_count_wordlike("t").alias("wl"),
        TX.fingerprint("t").alias("fp"),
    ).collect()[0]
    assert r.ws == 5
    assert r.wl == 7  # 5 words + ',' + '!'
    assert r.fp == hashlib.md5(b"the cat, and a dog!").hexdigest()


def test_multimodal_decode_stub(spark):
    docs = spark.createDataFrame([Row(doc_id=3, text="hello")])
    media = MM.media_from_documents(docs)
    out = MM.decode_media(media).collect()[0]
    h = hashlib.md5(b"hello").digest()
    assert out.media_id == 3
    assert out.media_type == "image"
    assert out.byte_len == 5
    assert out.width == 16 + h[0] % 240
    assert out.n_frames == 1


def test_kmeans_matches_numpy(spark):
    import numpy as np

    from beacon_data_importer_spark.operators.kmeans import kmeans_fit

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, assigned = kmeans_fit(df, k=4, max_iter=3)
    got = {r.id: r.cluster for r in assigned.collect()}

    rows = sorted(
        df.collect(), key=lambda r: r.vec_id
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    C = X[:4].copy()
    for _ in range(3):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        C = np.array(
            [X[a == j].mean(axis=0) if (a == j).any() else C[j] for j in range(4)]
        )
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = dict(zip(ids, d.argmin(axis=1)))

    np.testing.assert_allclose(
        np.array([v for _, v in sorted(cents, key=lambda t: t[0])]), C, atol=1e-6
    )
    assert got == want


def test_scd2_merge_semantics(spark):
    import datetime

    from pyspark.sql import Row

    from beacon_data_importer_spark.operators.scd import scd2_merge

    D = datetime.date
    history = spark.createDataFrame(
        [
            ("K1", "old", D(2019, 1, 1), D(2020, 1, 1)),  # closed history
            ("K1", "mid", D(2020, 1, 1), None),           # current, will change
            ("K2", "same", D(2020, 1, 1), None),          # current, no change
            ("K3", "gone", D(2020, 1, 1), None),          # current, no update
        ],
        "k string, v string, valid_from date, valid_to date",
    )
    updates = spark.createDataFrame(
        [
            Row(k="K1", v="new", eff=D(2021, 6, 1)),
            Row(k="K2", v="same", eff=D(2021, 6, 1)),
            Row(k="K9", v="born", eff=D(2021, 6, 1)),
        ]
    )
    out = scd2_merge(history, updates, "k", ["v"], effective_col="eff")
    rows = {(r.k, r.v, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        ("K1", "old", D(2019, 1, 1), D(2020, 1, 1)),
        ("K1", "mid", D(2020, 1, 1), D(2021, 6, 1)),   # closed at eff
        ("K1", "new", D(2021, 6, 1), None),            # opened
        ("K2", "same", D(2020, 1, 1), None),           # untouched
        ("K3", "gone", D(2020, 1, 1), None),           # untouched
        ("K9", "born", D(2021, 6, 1), None),           # brand-new key
    }


def test_approx_sketches_within_bounds(spark):
    """Sketch aggregates (the 100 TB path for distincts/quantiles) are
    rows-only w.r.t. the oracle (sketch internals differ by engine), so
    bounds are asserted here instead."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = df.select(F.count_distinct("o_custkey")).collect()[0][0]
    approx = df.select(
        F.approx_count_distinct("o_custkey", rsd=0.05)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15

    med_exact = df.selectExpr("percentile(o_totalprice, 0.5)").collect()[0][0]
    med_approx = df.selectExpr(
        "approx_percentile(o_totalprice, 0.5, 1000)"
    ).collect()[0][0]
    assert abs(med_approx - med_exact) / med_exact < 0.05


def test_char_trigrams_short_text_guard(spark):
    """Texts under 3 chars must yield an EMPTY gram array — without the
    guard, Spark's descending sequence(1, len-2) fabricates grams."""
    from pyspark.sql import Row

    from beacon_data_importer_spark.operators.text import char_trigrams

    df = spark.createDataFrame(
        [Row(t="ab"), Row(t=""), Row(t="abcd"), Row(t="  x  ")]
    )
    got = {r.t: r.g for r in df.select("t", char_trigrams("t").alias("g")).collect()}
    assert got["ab"] == []
    assert got[""] == []
    assert got["  x  "] == []
    assert got["abcd"] == ["abc", "bcd"]


def test_gopher_signals_edge_cases(spark):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat sat here too"),
            (2, "a a a a a a a a"),       # pure repetition
            (3, ""),                       # empty
            (4, "x1 9 88 zz 7"),           # symbol/number soup
        ],
        "id int, text string",
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            TX.mean_word_length("text").alias("mwl"),
            TX.alpha_word_fraction("text").alias("awf"),
            TX.dup_token_fraction("text").alias("dtf"),
            TX.top_ngram_char_fraction("text", 2).alias("t2g"),
            TX.gopher_keep("text").alias("keep"),
        ).collect()
    }
    # empty text: all signals zero, rejected
    assert rows[3].mwl == 0.0 and rows[3].awf == 0.0 and rows[3].t2g == 0.0
    assert rows[3].keep is False
    # repetition soup: clamped coverage, high dup fraction, rejected
    assert rows[2].t2g == 1.0
    assert rows[2].dtf == 7 / 8
    assert rows[2].keep is False
    # number soup fails the alpha-word rule
    assert rows[4].awf == 0.4 and rows[4].keep is False
    # doc 1: "the cat" and "cat sat" both occur twice; the tie goes to
    # "cat sat" (lexicographic), 6 chars x 2 of 36 token chars
    assert abs(rows[1].t2g - 12 / 36) < 1e-12
    assert rows[1].awf == 1.0


def test_top_ngram_char_fraction_tie_is_deterministic(spark):
    """Equal-count grams resolve to the lexicographically smallest —
    the property the SQL oracle's (cnt DESC, gram) argmax mirrors."""
    from beacon_data_importer_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "b c a b z z b c a b")], "id int, text string"
    )
    # 2-grams: "b c"x2, "c a"x2, "a b"x2, "b z", "z z", "z b" -> tie at 2;
    # "a b" is lexicographically smallest: 2*2 chars / 10 token chars
    val = df.select(
        TX.top_ngram_char_fraction("text", 2).alias("v")
    ).collect()[0].v
    assert abs(val - 4 / 10) < 1e-12


def test_sq_encode_bounds_and_determinism(spark):
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators import sq as SQ

    rows = [(i, [float(i % 7) - 3.0, 0.5, float(i) / 10.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    enc1 = {r.vec_id: r.codes for r in SQ.sq_encode(df).collect()}
    enc2 = {
        r.vec_id: r.codes for r in SQ.sq_encode(df.repartition(7)).collect()
    }
    assert enc1 == enc2
    for codes in enc1.values():
        assert len(codes) == 3
        assert all(0 <= c <= 255 for c in codes)
        # dim 1 is constant -> step 0 -> code 0
        assert codes[1] == 0
    # extremes land in the first/last buckets
    mins = [min(enc1[i][d] for i in enc1) for d in (0, 2)]
    maxs = [max(enc1[i][d] for i in enc1) for d in (0, 2)]
    assert mins == [0, 0] and maxs == [255, 255]


def test_contamination_hits_counts_distinct_overlaps(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # shares "alpha beta gamma"
            (2, "zeta eta theta iota"),        # no overlap
            (3, "alpha beta gamma alpha beta gamma"),  # dup grams count once
            (4, "xy"),                         # too short for 3-grams
        ],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon")], "doc_id int, text string"
    )
    out = {
        r.doc_id: r.n_overlap_grams
        for r in TX.contamination_hits(train, ev, "text", "doc_id", 3).collect()
    }
    # doc 3's repeated gram is distinct-counted once; docs 2/4 unflagged
    assert out == {1: 1, 3: 1}


def test_pii_redact_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "no pii here at all"),
            (2, "a@b.io then 1.2.3.4 then 555-123-4567"),
            (3, "version 1.2 costs 10.50 not an ip"),
        ],
        "id int, text string",
    )
    rows = {
        r.id: (r.t, r.c)
        for r in df.select(
            "id",
            TX.pii_redact("text").alias("t"),
            TX.pii_counts("text").alias("c"),
        ).collect()
    }
    assert rows[1] == ("no pii here at all", Row(n_emails=0, n_ips=0, n_phones=0))
    assert rows[2][0] == "<EMAIL> then <IP> then <PHONE>"
    assert tuple(rows[2][1]) == (1, 1, 1)
    # short dotted numbers are neither IPs nor phones
    assert rows[3][0] == "version 1.2 costs 10.50 not an ip"


def test_text_and_dedup_operators_survive_edge_case_docs(spark):
    """Adversarial inputs through the whole scan-side text/dedup
    surface: empty text, whitespace-only, one token, unicode,
    repetition soup, a 2000-token monster.  No exceptions, and every
    bounded signal stays in range — the guard that a 100 TB run's
    weird tail rows can't kill a stage."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators import dedup as DD
    from beacon_data_importer_spark.operators import text as TX
    from beacon_data_importer_spark.operators.text import _ntoks, _tokens

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, "héllo wörld ünïcode tökens ärë fïne"),
            (5, "dup dup dup dup dup dup dup dup dup dup"),
            (6, " ".join(f"tok{i % 97}" for i in range(2000))),
            (7, "\t tab\tand\nnewline  mixed   spacing \n"),
        ],
        ["doc_id", "text"],
    )
    t = F.col("__toks")
    sig = docs.select(
        "doc_id",
        _tokens("text").alias("__toks"),
    ).select(
        "doc_id",
        _ntoks(t).alias("n"),
        TX.mean_word_length_t(t).alias("mwl"),
        TX.alpha_word_fraction_t(t).alias("awf"),
        TX.dup_token_fraction_t(t).alias("dtf"),
        TX.top_ngram_char_fraction_t(t, 2).alias("t2g"),
    )
    for r in sig.collect():
        assert r.n >= 0
        assert 0.0 <= r.awf <= 1.0, r
        assert 0.0 <= r.dtf <= 1.0, r
        assert 0.0 <= r.t2g <= 1.0, r
        if r.doc_id in (1, 2):
            assert r.n == 0 and r.mwl == 0.0

    sigs = DD.minhash_signatures(docs, "text", "doc_id", 16)
    rows = sigs.collect()
    assert len(rows) == 7
    assert all(len(r.sig) == 16 for r in rows)
    bands = DD.lsh_bands(sigs, 4, 4)
    assert bands.count() == 7 * 4
    # pairing must not blow up or pair the empty/whitespace docs with
    # real content (their shingle fallback is the trimmed text itself)
    pairs = {
        (r.id_a, r.id_b)
        for r in DD.lsh_candidate_pairs(sigs, 4, 4, 50).collect()
    }
    assert (1, 2) in pairs  # "" and "   " both canonicalize to ''
    assert all(a in (1, 2) and b in (1, 2) for a, b in pairs if a <= 2 and b <= 2)

    fps = DD.exact_dedup(docs, "text", "doc_id").collect()
    assert sum(r.dup_count for r in fps) == 7


def test_approx_heavy_hitters_exact_within_capacity(spark):
    """Within sketch capacity the space-saving counts are exact: top-k
    tokens from approx_top_k must equal the exact count-and-sort."""
    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.sketch import (
        approx_heavy_hitters,
    )
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    got = [(r.item, r.cnt) for r in approx_heavy_hitters(toks, "tok", k=5).collect()]
    want = [
        (r.tok, r.cnt)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(5)
        .collect()
    ]
    assert got == want


def test_star_cc_matches_pointer_jump_cc(spark):
    """Large-star/small-star contraction and pointer-jumping CC must
    produce identical component-minimum labels — two independent
    algorithms cross-validating on a seeded random graph plus a long
    path (the diameter-stress case)."""
    import random

    from pyspark.sql import functions as F

    from beacon_data_importer_spark.operators.graph import (
        connected_components,
        star_connected_components,
        symmetrize,
    )

    rng = random.Random(7)
    pairs = {(rng.randrange(0, 400), rng.randrange(0, 400)) for _ in range(300)}
    pairs = [(a, b) for a, b in pairs if a != b]
    # long path 1000..1020 (diameter 20)
    pairs += [(1000 + i, 1000 + i + 1) for i in range(20)]
    e = symmetrize(
        spark.createDataFrame(pairs, ["a", "b"]), "a", "b"
    )
    jump = {
        (r.v, r.lbl) for r in connected_components(e).collect()
    }
    star = {
        (r.v, r.lbl) for r in star_connected_components(e).collect()
    }
    assert star == jump
    # the path collapses to one component labeled 1000
    assert all(l == 1000 for v, l in star if v >= 1000)
