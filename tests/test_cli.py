"""End-to-end test of the operational entry points (reference analogs:
process_levels.sh, populate_dbs.sh)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cosmoz_data_pipeline_spark.cli import _resolve_since, process_levels, read_level


def test_resolve_since_timestamp_wins():
    assert _resolve_since(30, "2021-06-01 00:00:00", None) == "2021-06-01 00:00:00"


def test_resolve_since_days_window():
    now = dt.datetime(2021, 3, 2, 12, 0, 0)
    assert _resolve_since(31, None, now) == (now - dt.timedelta(days=31)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    # default window is 365 days, per the reference CLI default
    assert _resolve_since(None, None, now) == (now - dt.timedelta(days=365)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def test_backfill_then_incremental(spark, sf_dir, tmp_path):
    out = (tmp_path / "levels").as_posix()

    # backfill: everything
    sinks = process_levels(spark, sf_dir, out, since="1970-01-01 00:00:00")
    assert set(sinks) == {"level1", "level2", "level3", "level4"}
    full = {n: read_level(spark, out, n).count() for n in sinks}
    assert all(c > 0 for c in full.values())

    # partition layout: per-site directories (dynamic overwrite unit)
    l4 = read_level(spark, out, "level4")
    assert "site_no" in l4.columns

    # incremental rerun of a later window must be idempotent for the
    # untouched early rows and leave counts unchanged (same data)
    process_levels(spark, sf_dir, out, since="2021-01-02 00:00:00")
    after = {n: read_level(spark, out, n).count() for n in sinks}
    assert after == full

    # single-site run touches only that site's partitions
    process_levels(spark, sf_dir, out, since="2021-01-02 00:00:00", site_no=1)
    one = read_level(spark, out, "level1")
    assert one.where(F.col("site_no") == 2).count() > 0  # other sites intact


def test_golden_ab_temp_workflow(spark, sf_dir, tmp_path):
    """The reference's do_tests flow: golden run, then a --temp shadow
    run A/B'd per level with the reference's exact thresholds."""
    import os

    from cosmoz_data_pipeline_spark.cli import golden_ab_report

    out = (tmp_path / "levels").as_posix()
    process_levels(spark, sf_dir, out, since="1970-01-01 00:00:00")
    process_levels(spark, sf_dir, out, since="1970-01-01 00:00:00", suffix="_temp")

    # identical rerun: every level within tolerance
    report = golden_ab_report(spark, out)
    assert all(r["ok"] for r in report.values()), report
    assert all(r["rows"] > 0 for r in report.values())

    # sub-threshold drift on level4 (abs 3.29e-5 tolerance): still PASS
    l4t = os.path.join(out, "level4_temp")
    shadow = spark.read.parquet(l4t)
    drifted = shadow.withColumn("soil_moist", F.col("soil_moist") + F.lit(1e-7))
    drifted.write.mode("overwrite").parquet(l4t + "_new")
    spark.read.parquet(l4t + "_new").write.mode("overwrite").parquet(l4t)
    report = golden_ab_report(spark, out, names=("level4",))
    assert report["level4"]["ok"], report

    # out-of-tolerance drift on level4: FAIL with counted mismatches
    drifted = spark.read.parquet(l4t).withColumn(
        "soil_moist", F.col("soil_moist") + F.lit(1e-2)
    )
    drifted.write.mode("overwrite").parquet(l4t + "_new")
    spark.read.parquet(l4t + "_new").write.mode("overwrite").parquet(l4t)
    report = golden_ab_report(spark, out, names=("level4",))
    assert not report["level4"]["ok"]
    assert report["level4"]["mismatches"] > 0

    # level1 is EXACT per the reference: any numeric drift fails
    l1t = os.path.join(out, "level1_temp")
    drifted = spark.read.parquet(l1t).withColumn(
        "count", F.col("count") + F.lit(1e-9)
    )
    drifted.write.mode("overwrite").parquet(l1t + "_new")
    spark.read.parquet(l1t + "_new").write.mode("overwrite").parquet(l1t)
    report = golden_ab_report(spark, out, names=("level1",))
    assert not report["level1"]["ok"]
