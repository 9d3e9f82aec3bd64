"""Cross-validation tests for the round-5b tier: each query checked
against an independent pure-Python formulation (a real list-based BPE
encoder for the tokenizer tier), so the DuckDB oracle's value-hash
isn't the only line of defense.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import __spark_entry__  # noqa: F401 (registers the full catalog)
from beacon_data_importer_spark.catalog import EXTRA_QUERIES, QUERIES
from beacon_data_importer_spark.catalog_r5b import BPE_MERGES

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


def _bpe_encode(word: str) -> list[str]:
    """Reference BPE encoder: list-based merge-all-left-to-right per
    rank, NOT the wrapped-string replace trick the engines use."""
    toks = list(word)
    for a, b in BPE_MERGES:
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _corpus_words(spark, sf_dir):
    from beacon_data_importer_spark.sources.parquet import read_table

    rows = read_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    return [
        (r.source, [w for w in re.split(r"[^a-z]+", r.text.lower()) if w])
        for r in rows
    ]


def test_bpe_tokenize_matches_list_encoder(spark, sf_dir):
    docs = _corpus_words(spark, sf_dir)
    want = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, chars, toks
    for source, words in docs:
        acc = want[source]
        acc[0] += 1
        acc[1] += len(words)
        acc[2] += sum(len(w) for w in words)
        acc[3] += sum(len(_bpe_encode(w)) for w in words)
    got = {
        r.source: [r.n_docs, r.n_words, r.n_chars, r.n_tokens]
        for r in ALL_QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    }
    assert got == dict(want)
    for r in ALL_QUERIES["bpe_tokenize"](spark, sf_dir).collect():
        assert r.tokens_per_word_ppm == r.n_tokens * 1_000_000 // r.n_words
        assert r.chars_per_token_ppm == r.n_chars * 1_000_000 // r.n_tokens


def test_bpe_merge_audit_matches_list_encoder(spark, sf_dir):
    """Per-rank firing counts from an instrumented list encoder, plus
    the conservation law chars - tokens == total firings."""
    docs = _corpus_words(spark, sf_dir)
    vocab = Counter(w for _, words in docs for w in words)
    firings = Counter()
    distinct = Counter()
    for word, cnt in vocab.items():
        toks = list(word)
        for rank, (a, b) in enumerate(BPE_MERGES, start=1):
            out: list[str] = []
            i = 0
            fired = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    fired += 1
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
            if fired:
                firings[rank] += fired * cnt
                distinct[rank] += 1
    got = {
        r.rank: (r.pair, r.merged, r.firings, r.distinct_words)
        for r in ALL_QUERIES["bpe_merge_audit"](spark, sf_dir).collect()
    }
    want = {
        rank: (f"{a}+{b}", a + b, firings[rank], distinct[rank])
        for rank, (a, b) in enumerate(BPE_MERGES, start=1)
        if firings[rank] > 0
    }
    assert got == want
    # conservation: every firing removes exactly one token
    tok_rows = ALL_QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    n_chars = sum(r.n_chars for r in tok_rows)
    n_tokens = sum(r.n_tokens for r in tok_rows)
    assert n_chars - n_tokens == sum(firings.values())
