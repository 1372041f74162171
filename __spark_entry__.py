"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline aggregate on sf0.001
queries()     -> one entry per implemented operator (SURVEY.md §2)
oracle_sql()  -> DuckDB-equivalent SQL per query (same parquet inputs)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full parse -> enrich ->
    route -> per-sink aggregate counts."""
    from gogstash_spark.entrypoints import q_pipeline_e2e

    return q_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gogstash_spark.entrypoints import PIPELINE_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(PIPELINE_QUERIES)
    try:
        from gogstash_spark.mlops.entries import MLOPS_QUERIES

        out.update(MLOPS_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from gogstash_spark.entrypoints import PIPELINE_ORACLES

    raw: dict = {}
    raw.update(PIPELINE_ORACLES)
    try:
        from gogstash_spark.mlops.entries import MLOPS_ORACLES

        raw.update(MLOPS_ORACLES)
    except ImportError:
        pass
    return {k: (v() if callable(v) else v) for k, v in raw.items() if v is not None}
