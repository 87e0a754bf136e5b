"""Incremental / streaming layer (SURVEY §2.9 ST1-ST4, ST6).

The reference's deployment model is scheduled incremental batch: every
run reprocesses [now − backprocess, now] per site and overwrites that
slice (/root/reference/pipeline/cosmoz_process_levels.py:42-48, 56-58;
process_levels.sh:19-20), with the *intent* of a streaming
materialized view (CREATE CONTINUOUS QUERY,
pipeline/raw->level1.sql:69-70). Spark gives both:

- ``incremental_overwrite``: the batch form — recompute a window,
  dynamic-partition-overwrite only the touched (site_no) partitions.
  Idempotent, re-runnable, the 100 TB-safe equivalent of
  DROP SERIES + rewrite.
- ``stream_dedup_to_sink``: the streaming form — ``readStream`` over
  an append directory, 24 h event-time watermark (ST3,
  nmdb/config.py:12-13), ``dropDuplicatesWithinWatermark`` (ST6 — the
  29-min ingest dedup generalized to watermark-bounded state),
  ``Trigger.AvailableNow`` micro-batch (ST1) into a parquet sink via
  ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_overwrite(
    transformed: DataFrame,
    sink_dir: str,
    since: str,
    time_col: str = "time",
    partition_col: str = "site_no",
) -> None:
    """Write ``transformed`` rows with ``time_col >= since`` (floored
    to the day) into a parquet table partitioned by
    ``(partition_col, p_date)``, overwriting ONLY the day partitions
    present in this batch (dynamic mode).

    The reference's incremental run point-overwrites the recomputed
    window (InfluxDB upserts on (time, tags); DROP SERIES is an
    optional full-site reset, cosmoz_process_levels.py:56-58) — rows
    OUTSIDE the window survive. Day-grained dynamic partition
    overwrite reproduces that durably at scale: the recompute window
    is day-aligned, exactly its (site, day) partitions are replaced,
    all earlier history is untouched, and re-runs are idempotent.
    ``transformed`` must be built from the full input (window
    functions near the boundary need pre-window context); the window
    filter applies only at write time.

    The pre-write ``repartition`` on the partition keys is
    load-bearing: without it every write task fans out one file into
    EVERY (site, day) directory it touches — tasks × dirs small files
    (measured at sf0.1: the ~1,400-directory backfill cost 38.8 s,
    dominated by file commit, and the blow-up grows with span × tasks).
    Hash-clustering rows by (site, day) first makes each directory the
    output of exactly one task — total files == touched partitions —
    for one keyed shuffle of the window's rows. Same cure at 100 TB,
    where a day partition is big enough that the shuffle is the cheap
    part.
    """
    day_start = F.to_date(F.lit(since).cast("timestamp_ntz"))
    (
        transformed.where(F.to_date(time_col) >= day_start)
        .withColumn("p_date", F.to_date(time_col))
        .repartition(F.col(partition_col), F.col("p_date"))
        .write.mode("overwrite")
        # per-write option, not the session-global conf: concurrent
        # overwrites on the same SparkSession must not race on a
        # mutated spark.sql.sources.partitionOverwriteMode
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col, "p_date")
        .parquet(sink_dir)
    )


# Round-15 state-partition sizing (VERDICT r14 task 3, ST6_STAGES
# .json): a stateful streaming query fixes its state-store partition
# count at FIRST micro-batch from spark.sql.shuffle.partitions, and
# every micro-batch thereafter pays one state commit (delta file +
# snapshot bookkeeping) PER PARTITION regardless of how many rows it
# holds. With the session floor at core count (32 here) and a tiny
# backlog, that per-partition commit tax dominated the query: the
# sf0.1 decomposition reads stream_nodedup 0.97 s / stream_dedup
# 3.02 s / stream_dedup@8parts 1.79 s — i.e. ~60 % of the state leg
# was commit overhead over EMPTY partitions (the same signature as
# PERF_r14's 0.39 low-core ratio, where the 8-core bench beat the
# 32-core one on identical code). The fix is the engine's standard
# answer (session.scale_shuffle_partitions, guide §2): derive the
# partition count from the source's BYTES — one target-sized input
# slice per state partition, min 8, capped — instead of a constant
# tuned to either local core count or a cluster fleet. At 100 TB the
# bytes-derived count far exceeds any core floor (MORE state
# parallelism than today); at bench scale it stops paying 32 commits
# for 3 MB of input. None = derive from source bytes; an int pins it
# (the A/B control).
STREAM_STATE_PARTITIONS: int | None = None
_STATE_PARTS_MIN = 8


def _state_partitions(spark: SparkSession, source_dir: str) -> int:
    from ..session import (
        SHUFFLE_PARTITIONS_CAP,
        SHUFFLE_TARGET_INPUT_BYTES,
        _path_bytes,
    )

    if STREAM_STATE_PARTITIONS is not None:
        return int(STREAM_STATE_PARTITIONS)
    return max(
        _STATE_PARTS_MIN,
        min(
            SHUFFLE_PARTITIONS_CAP,
            _path_bytes(source_dir, spark) // SHUFFLE_TARGET_INPUT_BYTES,
        ),
    )


def stream_dedup_to_sink(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    dedup_cols: Sequence[str],
    time_col: str = "time",
    watermark: str = "24 hours",
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Structured-Streaming ingest: parquet append dir → watermark →
    dropDuplicatesWithinWatermark → (optional batch transform) →
    parquet sink, processing all available data then stopping
    (Trigger.AvailableNow — the cron-style incremental run, ST1).

    The duplicate state is bounded by the watermark, so executor
    memory is O(keys within watermark) however large the backlog —
    the property the reference's 29-min SortedList lookback
    (cosmoz_process_levels.py:348-351) only had per-site in-process.

    The sink is replay-idempotent: each micro-batch plain-overwrites
    its own ``batch_id=N`` subdirectory of the parquet sink, so a
    batch re-run after a crash rewrites the same path instead of
    appending duplicates (foreachBatch offers at-least-once delivery;
    the wrapped write must supply the idempotence). Readers of
    ``sink_dir`` see an extra discovered ``batch_id`` partition column
    in the schema — project it away if unwanted.

    Dedup guarantee: ``dropDuplicatesWithinWatermark`` only dedups
    keys whose occurrences fall within one watermark span of state.
    A key recurring after the watermark expired its state is emitted
    again — matching the reference, whose 29-min lookback is likewise
    bounded. An oracle comparing against a global DISTINCT therefore
    assumes the backlog spans <= the watermark (true for the test
    corpus; assert upstream if relied upon).
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        # watermarks require TIMESTAMP (LTZ); under the UTC session tz
        # the NTZ→LTZ cast is a no-op rebase
        .withColumn(time_col, F.col(time_col).cast("timestamp"))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(list(dedup_cols))
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = transform(batch) if transform is not None else batch
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    # state partitions are frozen into the NEW checkpoint at first
    # micro-batch — size them from the source bytes (see
    # STREAM_STATE_PARTITIONS above), then restore the session conf
    # (an existing checkpoint keeps its own count; this path always
    # starts fresh checkpoints)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(_state_partitions(spark, source_dir)),
        )
        (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
