"""Streaming / incremental / stateful queries (SURVEY §2.9).

st5's oracle is a DuckDB *recursive CTE* — an independent second
implementation of the validity recurrence, so the hash-compare is a
genuine cross-check of the applyInPandas operator. The streaming
queries run real Structured Streaming jobs (AvailableNow) into temp
sinks and return the sink contents; their oracles check the
deterministic parts (the window-filtered recompute; the distinct key
set of the dedup).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain.synth import domain_prelude
from ..sources.tables import load_table
from ..streaming.incremental import incremental_overwrite, stream_dedup_to_sink
from ..streaming.stateful import validate_sequential
from .registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

# One shared scratch root, wiped per query run (round 1 left a fresh
# mkdtemp per run behind — slow for the driver and dirty for /tmp).
_SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), "cosmoz_scratch")


def _scratch(name: str) -> str:
    path = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _detach(df: DataFrame, scratch: str) -> DataFrame:
    """Materialize ``df`` off its temp-parquet lineage
    (localCheckpoint pins the rows in the block manager), then delete
    the scratch dir so the query leaves no disk residue even though
    the caller collects the result later."""
    out = df.localCheckpoint(eager=True)
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@register(
    "st5_stateful_validity",
    """
WITH RECURSIVE seq AS (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events),
walk AS (
    SELECT user_id, ts, value, rn,
           true AS valid, value AS last_valid, ts AS last_valid_ts
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.ts, s.value, s.rn,
           (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
             OR (s.value >= 8e-1 * w.last_valid AND s.value <= 1.2e0 * w.last_valid)
             AS valid,
           CASE WHEN (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
                     OR (s.value >= 8e-1 * w.last_valid AND s.value <= 1.2e0 * w.last_valid)
                THEN s.value ELSE w.last_valid END AS last_valid,
           CASE WHEN (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
                     OR (s.value >= 8e-1 * w.last_valid AND s.value <= 1.2e0 * w.last_valid)
                THEN s.ts ELSE w.last_valid_ts END AS last_valid_ts
    FROM seq s
    JOIN walk w ON s.user_id = w.user_id AND s.rn = w.rn + 1)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value, valid,
       round(last_valid, 6) AS last_valid
FROM walk""",
    doc="ST5/W2: run-dependent sequential validation (±20%% vs previous "
    "VALID value, 24 h staleness exemption — "
    "/root/reference/nmdb/entrypoint.py:122-134, nmdb/config.py:12-13) as "
    "applyInPandas per key; oracle = DuckDB recursive CTE.",
)
def q_stateful_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    out = validate_sequential(
        ev, key="user_id", time_col="ts", value_col="value", order_cols=["event_id"]
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
        "valid",
        F.round("last_valid", 6).alias("last_valid"),
    )


@register(
    "st1_incremental_overwrite",
    f"""{domain_prelude()}
SELECT strftime("time", '%Y-%m-%d %H:%M:%S') AS time, site_no, count, battery
FROM raw_values WHERE "time" >= TIMESTAMP '2021-01-01 12:00:00'""",
    doc="ST1/S12: incremental window recompute + dynamic partition overwrite "
    "— write only the touched site_no partitions of a parquet table, read "
    "back the sink (the reference's DROP SERIES + rewrite, "
    "/root/reference/pipeline/cosmoz_process_levels.py:56-58; cron window "
    "process_levels.sh:19-20).",
)
def q_incremental_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain.synth import load_domain

    raw = load_domain(spark, sf_dir)["raw_values"].select(
        "time", "site_no", "count", "battery"
    )
    scratch = _scratch("st1")
    sink = os.path.join(scratch, "sink")
    # first a full write, then the incremental overwrite of the window —
    # proving idempotent re-runs only touch the window's partitions
    incremental_overwrite(raw, sink, since="2021-01-01 00:00:00")
    incremental_overwrite(raw, sink, since="2021-01-01 12:00:00")
    back = spark.read.parquet(sink).where(
        F.col("time") >= F.lit("2021-01-01 12:00:00").cast("timestamp_ntz")
    )
    out = back.select(
        F.date_format("time", _TS_FMT).alias("time"),
        F.col("site_no").cast("int").alias("site_no"),
        "count",
        "battery",
    )
    return _detach(out, scratch)


@register(
    "st6_stream_dedup_watermark",
    """
SELECT DISTINCT user_id, event_type FROM events""",
    doc="ST6/ST1/ST3: real Structured-Streaming job — readStream over the "
    "events parquet, 24 h watermark, dropDuplicatesWithinWatermark on "
    "(user_id, event_type), Trigger.AvailableNow, foreachBatch "
    "parquet sink; returns the deduped key set (deterministic part — "
    "which duplicate survives is arrival-order-dependent).",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    work = _scratch("st6")
    src, sink, ckpt = (os.path.join(work, d) for d in ("src", "sink", "ckpt"))
    # one source file → one AvailableNow micro-batch, so the
    # watermark-bounded dedup equals the oracle's global DISTINCT
    # (see stream_dedup_to_sink's dedup-guarantee note)
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream_dedup_to_sink(
        spark,
        source_dir=src,
        sink_dir=sink,
        checkpoint_dir=ckpt,
        schema=schema,
        dedup_cols=["user_id", "event_type"],
        time_col="ts",
    )
    out = spark.read.parquet(sink).select("user_id", "event_type")
    return _detach(out, work)


@register(
    "st2_catchup_cursor",
    """
WITH cur AS (
    SELECT event_type, date_trunc('hour', max(ts)) AS cursor
    FROM events GROUP BY 1),
now_t AS (
    SELECT date_trunc('hour', max(ts)) + INTERVAL 2 HOUR AS now FROM events)
SELECT c.event_type,
       strftime(c.cursor, '%Y-%m-%d %H:%M:%S') AS cursor,
       strftime(unnest(generate_series(c.cursor + INTERVAL 1 HOUR, n.now,
                              INTERVAL 1 HOUR)), '%Y-%m-%d %H:%M:%S') AS step_ts
FROM cur c, now_t n""",
    doc="ST2: per-key catch-up cursor — the NMDB fetcher resumes each "
    "site from its stored max(time) and steps forward one hour at a "
    "time until 'now' (/root/reference/nmdb/entrypoint.py:69-99). "
    "Distributed: groupBy-max cursor per key, broadcast the scalar "
    "'now', sequence()+explode materializes each key's fetch manifest "
    "— one shuffle for the agg, the fan-out is scan-local.",
)
def q_catchup_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cur = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.max("ts")).alias("cursor")
    )
    now_t = ev.agg(
        (F.date_trunc("hour", F.max("ts")) + F.expr("INTERVAL 2 HOUR")).alias("now")
    )
    return (
        cur.crossJoin(F.broadcast(now_t))
        .select(
            "event_type",
            F.date_format("cursor", _TS_FMT).alias("cursor"),
            F.explode(
                F.sequence(
                    F.col("cursor") + F.expr("INTERVAL 1 HOUR"),
                    F.col("now"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("step"),
        )
        .select(
            "event_type", "cursor", F.date_format("step", _TS_FMT).alias("step_ts")
        )
    )
