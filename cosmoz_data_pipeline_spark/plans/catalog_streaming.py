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

# One scratch root PER PROCESS (uid+pid suffixed — ADVICE r2: a fixed
# shared path let two concurrent driver/bench processes rmtree each
# other's in-flight scratch, and a predictable world-writable /tmp name
# is a symlink surface). Each query run wipes only its own name under
# its own root; _detach removes the dir once the result is pinned.
_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"cosmoz_scratch_{os.getuid()}_{os.getpid()}"
)


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
FROM raw_values""",
    doc="ST1/S12: incremental window recompute + dynamic partition overwrite "
    "— write only the touched site_no partitions of a parquet table, read "
    "back the sink (the reference's DROP SERIES + rewrite, "
    "/root/reference/pipeline/cosmoz_process_levels.py:56-58; cron window "
    "process_levels.sh:19-20). The read-back covers the WHOLE table and "
    "the oracle expects every pre-window row to survive the second "
    "(2021-01-10+) overwrite — a silent regression to static overwrite "
    "mode would wipe the Jan 1-9 partitions and hash-mismatch (ADVICE r2).",
)
def q_incremental_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain.synth import load_domain

    raw = load_domain(spark, sf_dir)["raw_values"].select(
        "time", "site_no", "count", "battery"
    )
    scratch = _scratch("st1")
    sink = os.path.join(scratch, "sink")
    # full backfill, then an incremental overwrite of a LATER window:
    # only the (site, day>=Jan 10) partitions may be rewritten; the
    # full-table read-back proves the earlier partitions survived
    incremental_overwrite(raw, sink, since="2021-01-01 00:00:00")
    incremental_overwrite(raw, sink, since="2021-01-10 12:00:00")
    back = spark.read.parquet(sink)
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


# ------------------------------------------------- S7 end-to-end
# NMDB fixture day + fetch range. The fixture archive covers the full
# day (24 hourly files per station); the fetcher must read ONLY the
# reference's [start-1h, end+2h] window — hours outside it exist on
# disk, so a window-arithmetic bug changes the result set and fails
# the oracle.
_NMDB_DAY = "2024-01-05"
_NMDB_START = (2024, 1, 5, 6)
_NMDB_END = (2024, 1, 5, 18)

_NMDB_PREAMBLE = (
    "# NMDB NEST ASCII output\n"
    "# DATA TYPE: RCORR_E corrected for efficiency\n"
    "RCORR_E   start_date_time;value\n"
)


def _write_nmdb_fixture(spark: SparkSession, sf_dir: str, root: str) -> list[str]:
    """Hourly NEST archive synthesized from events: one file per
    (station=event_type, hour) holding a preamble the parser must skip
    plus one `ts;value` line — the first event of that hour (hourly
    resolution, tresolution=60), every 19th event a `null` marker.
    Deterministic, so the oracle rebuilds the identical feed."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(f"{_NMDB_DAY} 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp_ntz"))
    )
    w = W.partitionBy("event_type", F.date_trunc("hour", "ts")).orderBy("ts", "event_id")
    pick = (
        ev.select("event_type", "ts", "value", "event_id", F.row_number().over(w).alias("rw"))
        .where(F.col("rw") == 1)
        .select(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), _TS_FMT).alias("hts"),
            F.when(F.col("event_id") % 19 == 0, F.lit("   null"))
            .otherwise(F.round("value", 2).cast("string"))
            .alias("val_str"),
        )
    )
    stations = set()
    for r in pick.collect():
        stations.add(r["event_type"])
        hour_tag = r["hts"][:13].replace("-", "").replace(" ", "")
        d = os.path.join(root, r["event_type"])
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{hour_tag}.txt"), "w") as f:
            f.write(_NMDB_PREAMBLE + f"{r['hts']};{r['val_str']}\n")
    return sorted(stations)


@register(
    "s07_nmdb_fetch_parse",
    f"""
WITH RECURSIVE src AS (
    SELECT event_type AS station, date_trunc('hour', ts) AS hts, value, event_id,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rw
    FROM events
    WHERE ts >= TIMESTAMP '{_NMDB_DAY} 00:00:00'
      AND ts < TIMESTAMP '2024-01-06 00:00:00'),
feed AS (
    SELECT station, hts AS ts, round(value, 2) AS intensity
    FROM src
    WHERE rw = 1 AND event_id % 19 <> 0
      AND hts >= TIMESTAMP '2024-01-05 05:00:00'
      AND hts <= TIMESTAMP '2024-01-05 20:00:00'),
seq AS (
    SELECT station, ts, intensity,
           row_number() OVER (PARTITION BY station ORDER BY ts) AS rn
    FROM feed),
walk AS (
    SELECT station, ts, intensity, rn,
           true AS valid, intensity AS last_valid, ts AS last_valid_ts
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.station, s.ts, s.intensity, s.rn,
           (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
             OR (s.intensity >= 8e-1 * w.last_valid
                 AND s.intensity <= 1.2e0 * w.last_valid) AS valid,
           CASE WHEN (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
                     OR (s.intensity >= 8e-1 * w.last_valid
                         AND s.intensity <= 1.2e0 * w.last_valid)
                THEN s.intensity ELSE w.last_valid END AS last_valid,
           CASE WHEN (epoch(s.ts) - epoch(w.last_valid_ts) > 86400)
                     OR (s.intensity >= 8e-1 * w.last_valid
                         AND s.intensity <= 1.2e0 * w.last_valid)
                THEN s.ts ELSE w.last_valid_ts END AS last_valid_ts
    FROM seq s JOIN walk w ON s.station = w.station AND s.rn = w.rn + 1)
SELECT station, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, intensity, valid,
       round(last_valid, 6) AS last_valid
FROM walk""",
    doc="S7 END-TO-END (round 3 — closes the fetch half): driver-side "
    "range fetcher honoring the reference's [start-1h, end+2h] window "
    "(/root/reference/nmdb/data_getter.py:47-72) over a file:// hourly "
    "NEST archive (no network in the sandbox; http bases issue the "
    "reference's exact draw_graph.php URL), composed fetch → "
    "distributed parse_nmdb_lines (preamble skip + null markers) → "
    "±20%/24h sequential validity (ST5/W2) → validated intensity "
    "series. The fixture covers a full day but the window covers "
    "05:00-20:59, so the oracle (which filters by the same window "
    "arithmetic) catches any fetch-window bug.",
)
def q_nmdb_fetch_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from ..sources.nmdb import nmdb_ingest

    scratch = _scratch("s07")
    stations = _write_nmdb_fixture(spark, sf_dir, scratch)
    validated = nmdb_ingest(
        spark,
        stations,
        datetime(*_NMDB_START),
        datetime(*_NMDB_END),
        base_url="file://" + scratch,
    )
    out = validated.select(
        "station",
        F.date_format("ts", _TS_FMT).alias("ts"),
        "intensity",
        "valid",
        F.round("last_valid", 6).alias("last_valid"),
    )
    return _detach(out, scratch)


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
