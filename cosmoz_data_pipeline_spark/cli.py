"""Operational entry points mirroring the reference's user surface.

Reference CLIs (all become one-job Spark runs here):

- ``process-levels``: /root/reference/pipeline/cosmoz_process_levels.py
  main() (:677-749) — ``-d`` days-backprocess / ``-t`` timestamp,
  optional single site, then per-site recompute + DROP SERIES +
  rewrite. Here: one logical plan over all sites (the per-site OS
  process pool, :739-744, is Spark's partitioning), incremental window
  filter, dynamic-partition overwrite of only the touched site_no
  partitions per level.
- ``backfill``: populate_dbs.sh — bulk historical load of every level
  (backprocess window = everything).

Inputs are parquet directories containing the canonical tables
(``raw_values``, ``intensity``, ``silo_data``, ``all_stations`` — or
the driver test corpus from which they are derived). Outputs are
per-level parquet tables partitioned by ``site_no``.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .domain import levels
from .domain.synth import load_domain
from .session import build_session
from .streaming.incremental import incremental_overwrite

LEVELS = ("level1", "level2", "level3", "level4")


def _resolve_since(days: int | None, timestamp: str | None, now: dt.datetime | None) -> str:
    """Backprocess-window resolution per the reference (:701-716):
    explicit timestamp wins, else now − days (default 365)."""
    if timestamp:
        return timestamp
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    return (now - dt.timedelta(days=days if days is not None else 365)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def process_levels(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    since: str,
    site_no: int | None = None,
    spec_mode: bool = False,
) -> dict[str, str]:
    """Recompute every level for rows with ``time >= since`` and
    dynamic-partition-overwrite the touched ``site_no`` partitions —
    the idempotent equivalent of the reference's per-site
    DROP SERIES + rewrite (:56-58), for all sites in ONE job.
    """
    d = load_domain(spark, input_dir)
    raw = d["raw_values"]
    if site_no is not None:
        raw = raw.where(F.col("site_no") == site_no)
    out = levels.run_pipeline(
        raw, d["intensity"], d["silo_data"], d["all_stations"], spec_mode=spec_mode
    )
    sinks: dict[str, str] = {}
    for name in LEVELS:
        sink = os.path.join(output_dir, name)
        incremental_overwrite(out[name], sink, since=since)
        sinks[name] = sink
    return sinks


def read_level(spark: SparkSession, output_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, name))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="cosmoz-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("process-levels", help="incremental level recompute")
    pl.add_argument("-d", "--days-backprocess", type=int, default=None)
    pl.add_argument("-t", "--timestamp", default=None, help="process since (UTC)")
    pl.add_argument("--site", type=int, default=None)
    pl.add_argument("--spec-mode", action="store_true")
    pl.add_argument("--input", required=True)
    pl.add_argument("--output", required=True)

    bf = sub.add_parser("backfill", help="bulk historical load (all time)")
    bf.add_argument("--input", required=True)
    bf.add_argument("--output", required=True)

    args = p.parse_args(argv)
    spark = build_session(app_name="cosmoz-cli")
    try:
        if args.cmd == "process-levels":
            since = _resolve_since(args.days_backprocess, args.timestamp, None)
            process_levels(
                spark, args.input, args.output, since,
                site_no=args.site, spec_mode=args.spec_mode,
            )
        else:
            process_levels(spark, args.input, args.output, since="1970-01-01 00:00:00")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
