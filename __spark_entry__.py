"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse→enrich→route→aggregate pipeline;
`queries()` exposes each implemented operator (SURVEY.md §2 IDs in the names'
docstrings); `oracle_sql()` gives the DuckDB twin for the correctness gate.

Pipeline queries run over the deterministic synthetic transcripts table
(BASELINE.json input_hint) rendered by the same formula in both engines —
see openfactverification_spark/sources/transcripts.py. Operator-coverage
queries run over the driver's parquet tables in `sf_dir`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openfactverification_spark.entry_queries import (
    ORACLE_N_TURNS,
    build_oracle_sql,
    build_queries,
)
from openfactverification_spark.plans.pipeline import build_pipeline
from openfactverification_spark.sources.transcripts import transcripts_df


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline over a 4096-turn transcripts table → per-sink
    summary (route, role, counts, avg factuality)."""
    result = build_pipeline(spark, transcripts_df(spark, ORACLE_N_TURNS))
    return result.summary


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
