"""JSON-lines and ORC scan/sink layer.

The reference has no JSON/ORC *sources* (SURVEY §2.1 "not in
reference") — Spark provides them natively; these wrappers only pin the
engine's semantic policy onto them:

  * **Explicit schema by default.**  Schema inference needs an extra
    full pass over the data (or a sampled, therefore nondeterministic,
    one) — at warehouse scale the schema is a contract, not a discovery.
    ``read_jsonl`` takes a DDL string / StructType; inference is
    opt-in for exploration only.
  * **Error-as-null.**  PERMISSIVE mode + a ``_corrupt_record`` column
    mirrors the engine-wide petl ``failonerror=False`` posture (SURVEY
    §4.3.3): malformed lines become a row of nulls carrying the raw
    line, never an exception mid-job.
  * JSONL (one object per line), never multiline JSON arrays — line
    splitting is what makes the format splittable across executors.

ORC round-trips the same DataFrames as parquet (both columnar,
pushdown-capable); the wrapper exists so format choice is a one-word
swap at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with the engine's error-as-null policy.

    With ``schema`` given (the normal path), malformed lines yield
    all-null rows; pass ``keep_corrupt=True`` to retain the raw line in
    ``_corrupt_record`` for quarantine sinks.  Without a schema, Spark
    infers (extra pass — exploration only).
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_COL, "string")
        reader = reader.schema(schema)
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    df = reader.json(path)
    if not keep_corrupt and CORRUPT_COL in df.columns:
        df = df.drop(CORRUPT_COL)
    return df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write line-delimited JSON (splittable; one object per line)."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
