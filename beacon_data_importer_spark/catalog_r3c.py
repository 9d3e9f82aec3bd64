"""Round-3 catalog, part C: passage-level exact dedup and relational
keyword search.

Two corpus capabilities the earlier tiers did not cover:

  * passage_dedup — EXACT SUBSTRING dedup at passage granularity
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", §3 ExactSubstr; approximated at fixed word-window
    boundaries the way CCNet/C4 dedup at line/paragraph boundaries).
    Document-level dedup (dedup_exact / minhash_near_dup) drops whole
    documents; this removes REPEATED SPANS from otherwise-unique
    documents and reconstructs the cleaned text — the stage that
    catches boilerplate/quoted-chunk repetition inside kept docs.
  * bm25_search — keyword retrieval over a relational inverted index:
    tokenize → postings (doc, term, tf) → document frequencies → BM25
    score → top-k.  The standard corpus-inspection query ("which docs
    match these probe terms") expressed as DataFrame ops; the postings
    build is the classic search-engine shape.

Both are EXTRAS (registered=False): the 50 driver slots were rotated to
the never-proven queries this round (catalog.py rotation policy); the
local type-sensitive gate (tools/check_oracle.py via
tests/test_extra_queries.py) checks them against the DuckDB oracles
below.

Cross-engine determinism notes (module conventions, catalog.py):
  * BM25 uses the RATIONAL idf variant (N - df + 0.5)/(df + 0.5) —
    no ln() anywhere, because IEEE 754 specifies +,-,*,/ exactly but
    leaves log() rounding implementation-defined, so a log-based score
    could differ in the last ulp between engines and flip a floor().
    With identical double expression trees on both sides the score
    bits match exactly and floor(x*1e6) micro-units are stable.
  * avgdl is CAST(sum_tokens AS DOUBLE)/CAST(n_docs AS DOUBLE) — a
    division of two EXACT integers, not a double mean (double
    summation order differs between engines).
  * numeric literals in the oracle are written in e-notation (5e-1,
    2.2e0, ...) because a bare 0.5 is DECIMAL in DuckDB and would pull
    the whole expression into decimal arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import query
from .catalog_ext import _docs_parallel

# ---------------------------------------------------------------------------
# passage_dedup
# ---------------------------------------------------------------------------

_PASSAGE_W = 8  # words per passage (non-overlapping windows)

_DUCK_PASSAGES = f"""
    toks AS MATERIALIZED (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n
      FROM documents WHERE trim(text) <> ''
    ),
    pas AS (
      SELECT doc_id, unnest(range(0, n, {_PASSAGE_W})) AS st, tk, n
      FROM toks
    ),
    ph AS (
      SELECT doc_id, st,
             array_to_string(tk[st + 1 : least(st + {_PASSAGE_W}, n)], ' ')
               AS ptxt
      FROM pas
    )
"""


@query(
    "passage_dedup",
    registered=False,  # round-3 session-C addition; will rotate into a round-4 slot
    oracle=f"""
    WITH {_DUCK_PASSAGES},
    mk AS MATERIALIZED (
      SELECT doc_id, st, ptxt,
             row_number() OVER (PARTITION BY md5(ptxt)
                                ORDER BY doc_id, st) AS rn
      FROM ph
    )
    SELECT doc_id,
           coalesce(string_agg(ptxt, ' ' ORDER BY st)
                      FILTER (WHERE rn = 1), '') AS clean_text,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_passages,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS removed_passages
    FROM mk GROUP BY doc_id
    """,
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact passage-level dedup with text reconstruction: split every
    document into non-overlapping {w}-word passages, keep only the
    globally FIRST occurrence of each distinct passage (order = doc_id,
    then position), and rebuild each document's text from its surviving
    passages.  A fully-duplicated document comes back with empty
    ``clean_text`` — subsuming exact doc-dedup — while partially-copied
    documents keep their unique spans (the span-granular stage of
    Lee et al. 2022's ExactSubstr, at window boundaries).

    Plan: map-only tokenize/window/hash, ONE shuffle on the passage
    hash (window rank picks the first copy; the key is md5 of the
    passage so cardinality ~ distinct passages — high, no skew beyond
    true boilerplate, which AQE skew-join handling splits), one shuffle
    back on doc_id to reassemble (collect_list bounded by document
    size, never corpus-sized).  At 100 TB both exchanges carry one row
    per passage — corpus tokens / {w} — with no quadratic term
    anywhere.""".format(w=_PASSAGE_W)
    from .operators.text import _ntoks, _tokens

    d = _docs_parallel(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    toked = d.select(
        "doc_id", _tokens("text").alias("__toks")
    ).select("doc_id", "__toks", _ntoks(F.col("__toks")).alias("__n"))
    pas = toked.select(
        "doc_id",
        "__toks",
        "__n",
        F.explode(
            F.sequence(F.lit(0), F.col("__n") - 1, F.lit(_PASSAGE_W))
        ).alias("st"),
    )
    end = F.least(F.col("st") + F.lit(_PASSAGE_W), F.col("__n"))
    ph = pas.select(
        "doc_id",
        "st",
        F.array_join(
            F.slice(F.col("__toks"), F.col("st") + 1, end - F.col("st")), " "
        ).alias("ptxt"),
    )
    w = Window.partitionBy(F.md5(F.col("ptxt"))).orderBy("doc_id", "st")
    mk = ph.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("st"), F.col("ptxt"))
    )  # collect_list drops the NULLs for removed passages
    return mk.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["ptxt"]
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("kept_passages"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("removed_passages"),
    )


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1 = "1.2e0"
_BM25_K1P1 = "2.2e0"  # k1 + 1
_BM25_1MB = "2.5e-1"  # 1 - b  (b = 0.75)
_BM25_B = "7.5e-1"
_BM25_TOPK = 10


@query(
    "bm25_search",
    registered=False,  # round-3 session-C addition; will rotate into a round-4 slot
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n
      FROM documents WHERE trim(text) <> ''
    ),
    stats AS MATERIALIZED (SELECT count(*) AS nd, sum(n) AS s FROM toks),
    post AS MATERIALIZED (
      SELECT t.doc_id, u.tok, count(*) AS tf, max(t.n) AS dl
      FROM toks t, unnest(t.tk) AS u(tok)
      WHERE u.tok IN ({", ".join(repr(t) for t in _BM25_TERMS)})
      GROUP BY t.doc_id, u.tok
    ),
    dfreq AS MATERIALIZED (
      SELECT tok, count(*) AS df FROM post GROUP BY tok
    ),
    scored AS (
      SELECT p.doc_id,
        CAST(floor(
          ((CAST(s.nd AS DOUBLE) - CAST(d.df AS DOUBLE) + 5e-1)
             / (CAST(d.df AS DOUBLE) + 5e-1))
          * ((CAST(p.tf AS DOUBLE) * {_BM25_K1P1})
             / (CAST(p.tf AS DOUBLE)
                + {_BM25_K1} * ({_BM25_1MB}
                    + ({_BM25_B} * CAST(p.dl AS DOUBLE))
                      / (CAST(s.s AS DOUBLE) / CAST(s.nd AS DOUBLE)))))
          * 1e6) AS BIGINT) AS contrib_e6
      FROM post p JOIN dfreq d ON d.tok = p.tok CROSS JOIN stats s
    )
    SELECT doc_id, CAST(sum(contrib_e6) AS BIGINT) AS score_e6,
           CAST(count(*) AS BIGINT) AS terms_matched
    FROM scored GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id LIMIT {_BM25_TOPK}
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (probe terms {terms}, k1=1.2, b=0.75,
    top-{k}) over a relational inverted index: explode tokens, keep
    only postings for the query terms (the filter lands BEFORE any
    shuffle, so the exchange carries matching postings only — at 100 TB
    that's ~docs-containing-a-term rows, not corpus tokens), aggregate
    (doc, term) → tf, broadcast the |terms|-row document-frequency
    table and the 1-row corpus stats, score per posting, sum per doc,
    TakeOrdered top-k.

    idf is the RATIONAL variant (N - df + 0.5)/(df + 0.5) — monotone in
    the classic log idf, so the RANKING is BM25's, while the arithmetic
    stays in IEEE-exact +,-,*,/ for bit-identical cross-engine floors
    (module docstring).  avgdl = exact-int token sum / exact-int doc
    count for the same reason.""".format(
        terms="/".join(_BM25_TERMS), k=_BM25_TOPK
    )
    from .operators.text import _ntoks, _tokens

    d = _docs_parallel(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    toked = d.select(
        "doc_id", _tokens("text").alias("__toks")
    ).select("doc_id", "__toks", _ntoks(F.col("__toks")).alias("__n"))
    stats = toked.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("__n").alias("s")
    )
    post = (
        toked.select("doc_id", "__n", F.explode("__toks").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("__n").alias("dl"))
    )
    dfreq = post.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = F.col("nd").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("s").cast("double") / nd
    idf = (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    denom = tfd + F.lit(1.2) * (
        F.lit(0.25) + (F.lit(0.75) * dld) / avgdl
    )
    contrib = F.floor(idf * ((tfd * F.lit(2.2)) / denom) * F.lit(1e6)).cast(
        "bigint"
    )
    scored = (
        post.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("contrib_e6"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("contrib_e6").cast("bigint").alias("score_e6"),
            F.count(F.lit(1)).cast("bigint").alias("terms_matched"),
        )
        .orderBy(F.col("score_e6").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )
