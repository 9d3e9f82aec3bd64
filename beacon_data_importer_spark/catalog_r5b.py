"""Round-5b catalog tier: byte-pair-encoding tokenizer (shipped
merge-rank table, pure codegen string algebra — ROADMAP round-5 item
"byte-BPE merge ranks"), order-to-cash allocation math (FIFO payment
application, calendarized revenue recognition), and survival analysis
(Kaplan-Meier product-limit over exact quantized log terms).

Same cross-engine parity discipline as catalog.py (cents trick, floor
micro-units, id tie-breakers, identical aliases on both engines).  All
queries here are extras marked "rotation candidate for round 6".

Reference parity: the tokenizer tier generalizes the reference's
per-cell string transforms (``functions/expressions.py`` family,
reference ``prepare_contacts.py`` convert sites) to subword units; the
allocation tier is the windowed generalization of its staged
UPDATE-FROM arithmetic (``import_stage.py`` M4/M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import cents, query
from .sources.parquet import read_table

# ---------------------------------------------------------------------------
# BPE merge-rank table (the "pretrained tokenizer" artifact: an ordered
# list of symbol-pair merges, exactly how a trained BPE vocab ships).
# Later ranks compose over earlier ones (scan = (s,c) then (sc,an)).
# ---------------------------------------------------------------------------

BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("s", "t"), ("a", "t"), ("o", "r"),
    ("e", "n"), ("a", "r"), ("o", "u"), ("a", "l"), ("in", "g"),
    ("l", "e"), ("o", "w"), ("c", "h"), ("r", "o"), ("s", "c"),
    ("sc", "an"), ("d", "ow"), ("m", "er"), ("q", "u"),
]


def _bpe_merge_col(word: Column) -> Column:
    """Apply the full merge table to one word, returning the merged
    symbol string in wrapped encoding (every token as ``|tok|``).

    The wrapped encoding makes plain ``replace`` implement exactly
    BPE's "merge every occurrence, left to right, non-overlapping"
    rule: the pattern ``|a||b|`` can only match at token boundaries
    (tokens never contain ``|``), and adjacent repeats keep their own
    delimiters so ``|a||a||a|`` -> ``|aa||a|`` like a real encoder."""
    s = F.regexp_replace(word, "(.)", r"|$1|")
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return s


def _bpe_merge_sql(var: str) -> str:
    """DuckDB twin of :func:`_bpe_merge_col` (identical rule order)."""
    s = f"regexp_replace({var}, '(.)', '|\\1|', 'g')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '|{a}||{b}|', '|{a}{b}|')"
    return s


_BPE_TOKENIZE_ORACLE = f"""
    WITH w AS (
      SELECT source,
        list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    x -> x <> '') AS words
      FROM documents
    ),
    per_doc AS (
      SELECT source,
        CAST(len(words) AS BIGINT) AS n_words,
        CAST(coalesce(list_sum(list_transform(words,
          x -> length(x))), 0) AS BIGINT) AS n_chars,
        CAST(coalesce(list_sum(list_transform(words, x ->
          (length({_bpe_merge_sql('x')})
           - length(replace({_bpe_merge_sql('x')}, '|', ''))) // 2
        )), 0) AS BIGINT) AS n_tokens
      FROM w
    )
    SELECT source,
      count(*) AS n_docs,
      CAST(sum(n_words) AS BIGINT) AS n_words,
      CAST(sum(n_chars) AS BIGINT) AS n_chars,
      CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      CAST((sum(n_tokens) * 1000000) // sum(n_words) AS BIGINT)
        AS tokens_per_word_ppm,
      CAST((sum(n_chars) * 1000000) // sum(n_tokens) AS BIGINT)
        AS chars_per_token_ppm
    FROM per_doc GROUP BY source
"""


@query(
    "bpe_tokenize",
    registered=False,  # extra (round-5): rotation candidate for round 6
    oracle=_BPE_TOKENIZE_ORACLE,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-PAIR-ENCODING tokenizer over the corpus: apply a shipped
    merge-rank table (BPE_MERGES, the artifact a trained tokenizer
    ships) to every word and report per-source token economics — token
    count, tokens/word and chars/token in exact ppm — the numbers that
    size an LLM training run's token budget.

    Each word becomes a ``|c|``-wrapped symbol string; each merge rank
    is ONE ``replace`` call (see _bpe_merge_col for why that is exactly
    the encoder's merge-all-left-to-right semantics); the token count
    falls out of the delimiter count.  Everything stays inside
    whole-stage codegen — no UDF, no explode: the per-word loop is
    higher-order ``transform``/``aggregate`` over the split array, so
    the only exchange in the plan is the final per-source groupBy.  At
    100 TB this is the embarrassingly-parallel map + tiny-key
    aggregation shape; the merge table rides inside the plan (the
    degenerate broadcast)."""
    d = read_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    tok_counts = F.transform(
        words,
        lambda x: (
            (
                F.length(_bpe_merge_col(x))
                - F.length(F.replace(_bpe_merge_col(x), F.lit("|"), F.lit("")))
            )
            / F.lit(2)
        ).cast("long"),
    )
    char_counts = F.transform(words, lambda x: F.length(x).cast("long"))
    zero = F.lit(0).cast("long")
    per_doc = d.select(
        "source",
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(char_counts, zero, lambda acc, x: acc + x).alias("n_chars"),
        F.aggregate(tok_counts, zero, lambda acc, x: acc + x).alias("n_tokens"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tokens").alias("n_tokens"),
    ).select(
        "source",
        "n_docs",
        "n_words",
        "n_chars",
        "n_tokens",
        F.expr("(n_tokens * 1000000) div n_words").alias("tokens_per_word_ppm"),
        F.expr("(n_chars * 1000000) div n_tokens").alias("chars_per_token_ppm"),
    )


# ---------------------------------------------------------------------------
# bpe_merge_audit — per-rank firing counts over the distinct vocabulary
# ---------------------------------------------------------------------------


def _merge_audit_oracle() -> str:
    # Each step column references the previous one, so chain CTEs.
    chain = "vocab"
    ctes = []
    for i, (a, b) in enumerate(BPE_MERGES, start=1):
        ctes.append(
            f"st{i} AS (SELECT *, replace(s{i - 1}, '|{a}||{b}|',"
            f" '|{a}{b}|') AS s{i} FROM {chain})"
        )
        chain = f"st{i}"
    branches = " UNION ALL ".join(
        f"SELECT {i} AS rank, '{a}+{b}' AS pair, '{a}{b}' AS merged,"
        f" (length(s{i - 1}) - length(s{i})) // 2 AS fired,"
        f" cnt FROM {chain}"
        for i, (a, b) in enumerate(BPE_MERGES, start=1)
    )
    return f"""
    WITH words AS (
      SELECT unnest(list_filter(
        string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))
        AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, count(*) AS cnt,
        regexp_replace(word, '(.)', '|\\1|', 'g') AS s0
      FROM words GROUP BY word
    ),
    {", ".join(ctes)},
    fired AS ({branches})
    SELECT CAST(rank AS INT) AS rank, pair, merged,
      CAST(sum(fired * cnt) AS BIGINT) AS firings,
      CAST(sum(CASE WHEN fired > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS distinct_words
    FROM fired GROUP BY rank, pair, merged
    HAVING sum(fired * cnt) > 0
    """


@query(
    "bpe_merge_audit",
    registered=False,  # extra (round-5): rotation candidate for round 6
    oracle=_merge_audit_oracle(),
)
def q_bpe_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-TABLE AUDIT: how often each BPE merge rank actually fires
    across the corpus (frequency-weighted) and over how many distinct
    words — the vocabulary-health report that tells you which shipped
    merges earn their slot and which are dead weight.

    Scale strategy is the opposite of bpe_tokenize's stream-over-rows:
    the expensive 24-step chain runs once per DISTINCT word (the
    vocabulary, thousands of rows at any corpus size), each word
    carrying its corpus frequency from a cheap pre-aggregation — the
    classic apply-expensive-fn-to-distinct-keys rewrite.  Per-rank
    firing counts fall out of the wrapped-string length deltas (each
    firing removes exactly two delimiter chars); ``stack`` unpivots the
    24 step columns without a join."""
    d = read_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    vocab = (
        d.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = F.regexp_replace(F.col("word"), "(.)", r"|$1|")
    staged = vocab.withColumn("s0", s)
    for i, (a, b) in enumerate(BPE_MERGES, start=1):
        staged = staged.withColumn(
            f"s{i}",
            F.replace(
                F.col(f"s{i - 1}"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ),
        )
    stack_args = ", ".join(
        f"{i}, '{a}+{b}', '{a}{b}', (length(s{i - 1}) - length(s{i})) div 2"
        for i, (a, b) in enumerate(BPE_MERGES, start=1)
    )
    fired = staged.select(
        "cnt",
        F.expr(
            f"stack({len(BPE_MERGES)}, {stack_args})"
            " as (rank, pair, merged, fired)"
        ),
    )
    return (
        fired.groupBy("rank", "pair", "merged")
        .agg(
            F.sum(F.col("fired") * F.col("cnt")).alias("firings"),
            F.sum(F.when(F.col("fired") > 0, 1).otherwise(0)).alias(
                "distinct_words"
            ),
        )
        .filter(F.col("firings") > 0)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "pair",
            "merged",
            F.col("firings").cast("bigint").alias("firings"),
            F.col("distinct_words").cast("bigint").alias("distinct_words"),
        )
    )
