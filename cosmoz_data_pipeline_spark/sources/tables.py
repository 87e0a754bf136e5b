"""Parquet table loaders for the benchmark/test corpus (S1/S2).

Reference analog: projected+predicated InfluxQL scans
(/root/reference/pipeline/cosmoz_process_levels.py:49-54) — here a
plain ``spark.read.parquet`` whose filters/projections Catalyst pushes
into the columnar scan (PushedFilters / ReadSchema in .explain()).

One wrinkle: the driver-generated parquet stores ``events.ts`` as
INT64 TIMESTAMP(NANOS), which Spark's parquet reader only accepts with
``spark.sql.legacy.parquet.nanosAsLong=true`` (returns the raw int64).
We convert nanos → TIMESTAMP_NTZ(micros) explicitly, matching DuckDB's
truncating nanos→micros cast so both engines see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import harden_session, scale_shuffle_partitions

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns stored as TIMESTAMP(NANOS) in the test corpus → arrive as
# int64 under nanosAsLong and need explicit conversion
_NANOS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    harden_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    # spill-aware: size the shuffle-partition ceiling to the corpus
    # bytes loaded so far (AQE coalesces back down; see session.py)
    scale_shuffle_partitions(spark, sf_dir, path)
    df = spark.read.parquet(path)
    for col in _NANOS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer division keeps full precision (ns beyond 2^53);
            # CAST LTZ→NTZ under the UTC session tz is a no-op rebase
            df = df.withColumn(
                col, F.expr(f"CAST(timestamp_micros({col} div 1000) AS TIMESTAMP_NTZ)")
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql use)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
