"""beacon_data_importer_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ``timwis/beacon-data-importer``.

The reference is a two-stage ETL system (petl row-stream pipelines +
Postgres SQL import scripts).  This engine re-expresses the full operator
surface (see SURVEY.md §2) as lazy Spark DataFrame plans so that Catalyst
performs the optimization petl never did (column pruning, predicate
pushdown, join selection) and Tungsten/whole-stage-codegen executes it
vectorized, partitioned, and spill-safe — i.e. the same semantics, but
viable at 100 TB instead of 10⁴ rows.

Layout:
  session     SparkSession factory (non-ANSI null-on-error mode, AQE on)
  sources     scan/sink layer (CSV with petl-compatible string semantics,
              parquet, sinks)
  functions   the scalar-expression library (SURVEY §2.7 X1–X23) compiled
              to native Column expressions — zero Python UDFs on hot paths
  operators   dataflow operators (filters, flatMap, union, dedup, joins,
              surrogate ids, upsert) + scale extensions (minhash/simhash
              dedup, similarity search, text analysis, multimodal)
  plans       end-to-end pipelines mirroring the reference entry points
              (prepare_contacts, prepare_calls, SQL import stage)
  streaming   Structured Streaming variants (event-time windows, state)
"""

__version__ = "0.1.0"
