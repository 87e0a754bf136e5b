"""NMDB NEST ASCII protocol source (SURVEY §2.1 S7).

The reference fetches `http://nmdb.eu/nest/draw_graph.php?...` and
parses `timestamp;value` ASCII lines, skipping the preamble until the
`RCORR_E` header and treating `null` as missing
(/root/reference/nmdb/data_getter.py:39-123, 194-239).

Here the HTTP fetch is a driver-side concern (batch pull →
``spark.createDataFrame`` — the range endpoint already returns whole
windows); the *parser* is a distributed DataFrame transform so a 100 TB
backfill of archived NEST dumps parses in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lines that look like `2021-01-01 00:00:00;123.45`
_DATA_LINE = r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2};"


def parse_nmdb_lines(lines: DataFrame, column: str = "line") -> DataFrame:
    """Parse `ts;value` records out of raw NEST response lines.

    Preamble/garbage lines (no leading timestamp) are dropped — the
    reference's "skip until RCORR_E" loop (data_getter.py:104-113);
    `null` markers survive as NULL intensity with a flag
    (data_getter.py:116-119 skips them; we keep the marker so callers
    can choose).
    """
    c = F.col(column)
    parsed = lines.where(c.rlike(_DATA_LINE)).select(
        F.split(c, ";").getItem(0).alias("ts_str"),
        F.trim(F.split(c, ";").getItem(1)).alias("raw_value"),
    )
    return parsed.select(
        "ts_str",
        F.when(F.col("raw_value") != "null", F.col("raw_value").cast("double")).alias(
            "intensity"
        ),
        (F.col("raw_value") == "null").alias("is_null_marker"),
    )
