"""Banded (bucketed) range self/two-table join — SURVEY §2.3 J7/J10.

The reference finds duplicate candidates with an in-memory SortedList
range scan per site (/root/reference/pipeline/cosmoz_process_levels.py
:348-351, :375-377; /root/reference/pipeline/detect_duplicates.py:59-68)
— driver-bound. The distributed form: bucket both sides by
floor(epoch / band), explode the probe side into the two buckets its
lookback window can touch, equi-join on (key, bucket, equality
columns), then apply the exact range predicate. This keeps the join an
equi-join (hash/sort-merge, AQE-skew-splittable) instead of a
cartesian-per-key theta join — the standard interval-bucketing
technique for range joins at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    equal_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairs (l, r) with same ``key`` + ``equal_cols`` and
    ``r.time ∈ [l.time − lower_seconds, l.time)``.

    Output columns: key, *equal_cols (the shared values), ``left_time``
    and ``right_time`` (renamed literally).
    """
    equal_cols = list(equal_cols)
    band = lower_seconds
    lhs = left.select(
        key,
        *equal_cols,
        F.col(left_time).alias("left_time"),
        F.floor(F.col(left_time).cast("long") / band).alias("_lband"),
    ).withColumn("_band", F.explode(F.array(F.col("_lband") - 1, F.col("_lband"))))
    rhs = right.select(
        key,
        *equal_cols,
        F.col(right_time).alias("right_time"),
        F.floor(F.col(right_time).cast("long") / band).alias("_band"),
    )
    joined = lhs.join(rhs, [key, "_band", *equal_cols])
    in_range = (
        F.col("right_time") >= F.col("left_time") - F.expr(f"INTERVAL {lower_seconds} SECOND")
    ) & (F.col("right_time") < F.col("left_time"))
    return joined.where(in_range).drop("_lband", "_band")
