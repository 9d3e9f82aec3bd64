"""Corpus LSH staging plan: ONE signature table + ONE candidate-pair
stream, shared by every near-dup consumer.

The same pattern (and rationale) as ``plans/er.py``: round-3's
document near-dup queries (minhash_near_dup, near_dup_clusters,
near_dup_keep, ngram_jaccard_pairs) each recomputed the MinHash
signature pass — the dominant LSH cost (~1.5-2 s warm at sf0.1 per
query).  This module materializes the signature frame and the banded
candidate pairs once per (session, sf_dir) via ``localCheckpoint``, so
downstream queries pay marginal cost only.

At warehouse scale both stages ARE tables the pipeline writes once per
corpus build (`signatures`, `candidate_pairs`) — the checkpoint is the
local stand-in, exactly as the ER staging documents.  corpus_clean /
corpus_curate do NOT consume this stage: they sign a FILTERED survivor
corpus, which is a different input by construction.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

from ..catalog_ext import (
    BANDS,
    MAX_BUCKET,
    NUM_HASHES,
    ROWS_PER_BAND,
    _docs_parallel,
)
from ..operators.dedup import lsh_candidate_pairs
from ..operators.text_arrow import minhash_signatures_arrow
from .staging_meter import staged_build

_STAGE: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def corpus_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, sig) MinHash signature table for the documents corpus,
    staged once per session and scale factor."""
    per_session = _STAGE.setdefault(spark, {})
    key = ("sigs", sf_dir)
    if key not in per_session:
        with staged_build(f"corpus_sigs|{sf_dir}"):
            d = _docs_parallel(spark, sf_dir)
            # r12: Arrow kernel — bit-identical to the SQL form
            # (tests/test_text_arrow.py), one vectorized pass instead
            # of the interpreted per-shingle md5+conv+fold chain
            sigs = minhash_signatures_arrow(d, "text", "doc_id", NUM_HASHES)
            per_session[key] = sigs.localCheckpoint()
    return per_session[key]


def corpus_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b) banded LSH candidate pairs over the staged
    signatures, staged once per session and scale factor."""
    per_session = _STAGE.setdefault(spark, {})
    key = ("pairs", sf_dir)
    if key not in per_session:
        sigs = corpus_signatures(spark, sf_dir)
        with staged_build(f"corpus_pairs|{sf_dir}"):
            pairs = lsh_candidate_pairs(sigs, BANDS, ROWS_PER_BAND, MAX_BUCKET)
            per_session[key] = pairs.localCheckpoint()
    return per_session[key]


def corpus_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, s) distinct word-3-gram shingle SETS for the documents
    corpus, staged once per session and scale factor — the shared
    input of the EXACT set-similarity tier (prefix_filter_jaccard_join
    and any verify stage that needs true sets rather than MinHash
    sketches).  Shingling is the dominant CPU of those queries (~5 s
    of codegen transform + array_distinct at sf0.1), so it follows the
    signature table's stage-once discipline."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _shingles

    per_session = _STAGE.setdefault(spark, {})
    key = ("shingle_sets", sf_dir)
    if key not in per_session:
        with staged_build(f"corpus_shingle_sets|{sf_dir}"):
            d = _docs_parallel(spark, sf_dir)
            shd = d.select(
                F.col("doc_id").alias("id"),
                F.array_distinct(_shingles(F.col("text"))).alias("s"),
            )
            per_session[key] = shd.localCheckpoint()
    return per_session[key]
