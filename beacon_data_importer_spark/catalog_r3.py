"""Round-3 catalog: dataset-assembly breadth (ROADMAP items 5-6) and
the remaining TPC-H query shapes.

Packing gains the two no-split variants a training-shard builder
actually chooses between — serpentine balanced binning (SQL-exact,
oracle-replayed) and hard-capacity best-fit-decreasing (per-shard Arrow
escape hatch, invariant-tested, catalog ROWS_ONLY) — plus the
pack-utilization QA histogram.  Sampling gains exact-count stratified
selection and config-table mixture weights (broadcast-joined, with a
default-rate fallback).  All new queries are EXTRAS (registered=False):
the 50 driver slots are occupied this round by the rotation that
promotes every not-yet-driver-proven query (see catalog.py docstring);
these run under the local type-sensitive gate and rotate into slots
next round.

Oracle style follows catalog_r2: exact-integer window arithmetic that
DuckDB replays bit-for-bit, config tables as VALUES CTEs, and
``CAST(... AS BIGINT)`` on every DuckDB aggregate that would widen to
HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import ROWS_ONLY, cents, query
from .catalog_r2 import _duck_hash64
from .sources.parquet import read_table

# Shared oracle fragment: whitespace token counts + 8-way hash sharding,
# identical to the (driver-green) sequence_packing oracle.
_TOKS_CTE = f"""
    toks AS (
      SELECT doc_id AS id,
        {_duck_hash64("CAST(doc_id AS VARCHAR)", seed=7)} % 8 AS shard,
        CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS BIGINT) AS n_tokens
      FROM documents
    )
"""

_SERPENTINE_CTES = f"""
    WITH {_TOKS_CTE},
    ranked AS (
      SELECT id, shard, n_tokens,
        row_number() OVER (
          PARTITION BY shard ORDER BY n_tokens DESC, id
        ) - 1 AS pos,
        greatest(CAST(1 AS BIGINT),
          CAST(floor((sum(n_tokens) OVER (PARTITION BY shard) + 511)
                     / 512.0) AS BIGINT)) AS n_bins
      FROM toks
    ),
    packed AS (
      SELECT id, shard, n_tokens,
        CAST(CASE WHEN (pos // n_bins) % 2 = 0 THEN pos % n_bins
                  ELSE n_bins - 1 - (pos % n_bins) END AS BIGINT)
          AS pack_id
      FROM ranked
    )
"""


@query(
    "pack_bins_balanced",
    registered=False,  # round-3 addition; slots are full this round (rotation policy, catalog.py)
    oracle=_SERPENTINE_CTES + "SELECT id, shard, n_tokens, pack_id FROM packed",
)
def q_pack_bins_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serpentine balanced binning at a 512-token budget over 8 hash
    shards: exactly ceil(shard_tokens/512) packs per shard, docs dealt
    in snake order of decreasing length so pack loads concentrate at
    the budget.  No document is split (contrast sequence_packing's
    stream chunking); one shard exchange carries both window passes."""
    from .operators.sampling import pack_bins_serpentine
    from .operators.text import token_count_ws

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tokens_src")
    )
    return pack_bins_serpentine(d, "doc_id", "n_tokens_src", budget=512)


@query(
    "pack_utilization",
    registered=False,  # round-3 addition; slots full (rotation policy, catalog.py)
    oracle=_SERPENTINE_CTES
    + """,
    per_pack AS (
      SELECT shard, pack_id, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM packed GROUP BY shard, pack_id
    )
    SELECT CAST(floor(pack_tokens * 10 / 512.0) AS BIGINT) AS util_decile,
           count(*) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(pack_tokens) AS BIGINT) AS sum_tokens
    FROM per_pack GROUP BY 1
    """,
)
def q_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-utilization QA histogram over the serpentine packing:
    per-pack token loads bucketed by utilization decile (10 = exactly
    full, >10 = overflow the loader truncates).  The per-pack agg
    reuses the packing's shard partitioning; the decile agg runs on a
    frame already one-row-per-pack."""
    from .operators.sampling import pack_bins_serpentine, pack_utilization
    from .operators.text import token_count_ws

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tokens_src")
    )
    packed = pack_bins_serpentine(d, "doc_id", "n_tokens_src", budget=512)
    return pack_utilization(packed, budget=512)


ROWS_ONLY.add("pack_bins_bestfit")


@query(
    "pack_bins_bestfit",
    registered=False,  # round-3 addition; ROWS_ONLY (no SQL twin — see operator docstring)
)
def q_pack_bins_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-capacity best-fit-decreasing packing (512-token budget, 8
    hash shards) via the per-shard Arrow escape hatch.  The open-bin
    placement loop has no SQL twin, so this is a ROWS_ONLY catalog
    entry; tests/test_sampling.py asserts the invariants (capacity
    respected, every doc packed exactly once, deterministic under
    repartitioning, pack count within the BFD bound of the
    ceil(total/budget) lower bound)."""
    from .operators.sampling import pack_bins_bestfit
    from .operators.text import token_count_ws

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws("text").alias("n_tokens_src")
    )
    return pack_bins_bestfit(d, "doc_id", "n_tokens_src", budget=512)


@query(
    "stratified_exact_sample",
    registered=False,  # round-3 addition; slots full (rotation policy, catalog.py)
    oracle=f"""
    WITH targets(lang, target_n) AS (
      VALUES ('en', 150), ('de', 40), ('es', 40), ('fr', 100), ('zh', 30)
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, t.target_n,
        row_number() OVER (
          PARTITION BY d.lang
          ORDER BY {_duck_hash64("CAST(d.doc_id AS VARCHAR)", seed=11)},
                   d.doc_id
        ) AS rk
      FROM documents d JOIN targets t ON t.lang = d.lang
    )
    SELECT doc_id, lang FROM ranked WHERE rk <= target_n
    """,
)
def q_stratified_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling: per-language target counts from
    a broadcast config table, membership by stable-hash rank within the
    stratum (fr's target exceeds its stratum, exercising the
    keep-everything branch).  One window shuffle; exact counts by
    construction — no threshold-then-top-up second pass."""
    from .operators.sampling import stratified_sample_exact

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    targets = spark.createDataFrame(
        [("en", 150), ("de", 40), ("es", 40), ("fr", 100), ("zh", 30)],
        "lang string, target_n int",
    )
    return stratified_sample_exact(d, "lang", targets, "doc_id").select(
        "doc_id", "lang"
    )


@query(
    "mixture_config_sample",
    registered=False,  # round-3 addition; slots full (rotation policy, catalog.py)
    oracle=f"""
    WITH rates(source, rate_bp) AS (
      VALUES ('src0', 9000), ('src1', 8000), ('src2', 7000), ('src3', 6000),
             ('src4', 5000), ('src5', 4000), ('src6', 3000), ('src7', 2000),
             ('src8', 1500), ('src9', 500)
    ),
    rated AS (
      SELECT d.doc_id, d.source, COALESCE(r.rate_bp, 1000) AS rate_bp
      FROM documents d LEFT JOIN rates r ON r.source = d.source
    )
    SELECT doc_id, source FROM rated
    WHERE {_duck_hash64("CAST(doc_id AS VARCHAR)", seed=4)} % 10000 < rate_bp
    """,
)
def q_mixture_config_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weights from an explicit config table: ten sources get
    reviewed rates, the rest fall back to a 10% default via left join +
    coalesce; the broadcast join plus hash-threshold keep rule stays
    map-only.  Returns the kept membership so the oracle checks every
    individual keep decision, not just counts."""
    from .operators.sampling import mixture_sample_config

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = spark.createDataFrame(
        [
            ("src0", 9000), ("src1", 8000), ("src2", 7000), ("src3", 6000),
            ("src4", 5000), ("src5", 4000), ("src6", 3000), ("src7", 2000),
            ("src8", 1500), ("src9", 500),
        ],
        "source string, rate_bp int",
    )
    return mixture_sample_config(
        d, "doc_id", "source", rates, default_rate_bp=1000
    ).select("doc_id", "source")
