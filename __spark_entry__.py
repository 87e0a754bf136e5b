"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
via the engine's query registry
(cosmoz_data_pipeline_spark/plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cosmoz_data_pipeline_spark.plans import REGISTRY
from cosmoz_data_pipeline_spark.session import harden_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full cosmoz level pipeline (raw → level4) on
    sf0.001 — scan, dedup, window, as-of joins, broadcast dim join,
    physics expressions, range-frame moving average in one plan."""
    harden_session(spark)
    return REGISTRY["level4"].run(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            harden_session(spark)
            return REGISTRY[name].run(spark, sf_dir)

        run.__name__ = f"q_{name}"
        run.__doc__ = REGISTRY[name].doc
        return run

    return {name: wrap(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys match ``queries()``)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
