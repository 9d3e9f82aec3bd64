"""Dataset-assembly operators for training pipelines: deterministic
splits, per-source quota capping, and token-budget sequence packing.

These are the steps between "cleaned corpus" and "training shards":
assign every document to train/val/test reproducibly (no RNG state to
ship, any engine recomputes the same split), cap any one source's share
of the mix, and pack variable-length documents into fixed-token-budget
sequences.  Everything is a pure Column/window computation — one shuffle
per operator, no Python — and deterministic, so the DuckDB oracles
replay them exactly.

The reference has no analogue (its pipeline ends at a Postgres COPY —
README.md:73-78); these extend the repo's training-data tier
(SURVEY §7.5) the same way the dedup/similarity operators do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expressions import portable_hash64


def split_assign(
    id_col: Column | str,
    train_pct: int = 90,
    val_pct: int = 5,
    seed: int = 0,
) -> Column:
    """Deterministic train/val/test label from a stable id hash.

    ``portable_hash64(id) % 100`` buckets the key space uniformly; the
    first ``train_pct`` buckets are train, the next ``val_pct`` val,
    the rest test.  Hash-based (not ``rand()``-based) so the split is
    reproducible across runs, engines, and partitionings — re-running
    the pipeline after adding documents never reshuffles existing
    assignments (the property a training pipeline actually needs from
    its split).
    """
    bucket = portable_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def quota_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    max_per_group: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, deterministically
    (ranked by ``order_col`` — a stable hash column makes this a uniform
    subsample; a quality score makes it best-of-source).

    Determinism requires a total order within each group: pass
    ``tiebreak_col`` whenever ``order_col`` can tie (no column-name
    default — a generic operator must not assume the caller's schema).
    The rank's working column is chosen to dodge any existing column.

    One shuffle on the group key; the window rank and the filter fuse
    into the same stage.  The classic mixing-control step: no single
    domain/source may dominate the training mix.
    """
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    rk = "__rk"
    while rk in df.columns:
        rk += "_"
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn(rk, F.row_number().over(w))
        .filter(F.col(rk) <= max_per_group)
        .drop(rk)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: Column | str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (greedy by id order
    within each shard): pack_id = floor(cumulative_tokens / budget).

    A doc whose running total crosses a budget boundary starts a new
    pack — the floor-div formulation over a running sum is exact, needs
    ONE window pass, and is deterministic given the (shard, id) order.
    Shards bound the sequential dependency: the running sum only spans a
    shard, so packs parallelize across shards (at 100 TB the shard is
    the natural unit of work; a global running sum would serialize the
    corpus through one partition).

    Returns (id, shard, n_tokens, pack_id).  Oversized docs (> budget)
    get a pack of their own (their start boundary still advances the
    counter), matching what a sequence-packing loader does before
    truncation.
    """
    shard = (
        F.col(shard_col) if isinstance(shard_col, str) else shard_col
        if shard_col is not None
        else (portable_hash64(F.col(id_col).cast("string"), seed=7) % 8)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        shard.alias("shard"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    # pack by the token interval's START offset: doc i occupies
    # [running - n_tokens, running) within the shard's token stream
    pack = F.floor((running - F.col("n_tokens")) / F.lit(budget))
    return base.select(
        "id", "shard", "n_tokens", pack.cast("bigint").alias("pack_id")
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    rate_bp_col: Column | str,
    seed: int = 4,
) -> DataFrame:
    """Keep each row with its group's target rate (in basis points,
    0-10000), decided by a stable id hash: ``hash(id) % 10000 <
    rate_bp``.  The deterministic form of mixture weighting — each
    source contributes its configured fraction of the training mix, the
    SAME rows survive every rerun, and no RNG state exists to ship.
    Map-only (zero shuffle) once the rate column is present; with a
    per-source rate table, broadcast-join it on first."""
    rate = F.col(rate_bp_col) if isinstance(rate_bp_col, str) else rate_bp_col
    keep = (
        portable_hash64(F.col(id_col).cast("string"), seed=seed) % 10000
    ) < rate
    return df.filter(keep)
