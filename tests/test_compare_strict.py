"""The local correctness gate must be at least as strict as the
driver's hash compare. Round 3 lost a row to exactly this gap: the
DuckDB oracle's integer sum() promoted to HUGEINT, pandas materialized
it as float64, and the driver hashed 15.0 != 15 while tools/compare.py
tolerantly equated them. compare() now fails on numeric-kind
divergence even when every value is equal."""

from __future__ import annotations

import duckdb

from tools.compare import compare


def test_int_vs_float_equal_values_fail(spark):
    con = duckdb.connect()
    sdf = spark.createDataFrame([(1, 15), (2, 7)], "id long, bucket long")
    ok, msg = compare(sdf, "SELECT * FROM (VALUES (1, 15.0), (2, 7.0)) t(id, bucket)", con)
    assert not ok
    assert "dtype kind mismatch" in msg


def test_hugeint_sum_unfixed_oracle_fails(spark):
    """The literal round-3 failure shape: un-CAST DuckDB integer sum."""
    con = duckdb.connect()
    sdf = spark.createDataFrame([(0, 22)], "g long, s long")
    bad = "SELECT g, sum(v) AS s FROM (VALUES (0, 15), (0, 7)) t(g, v) GROUP BY g"
    ok, msg = compare(sdf, bad, con)
    assert not ok and "dtype kind mismatch" in msg
    fixed = bad.replace("sum(v)", "CAST(sum(v) AS BIGINT)")
    ok, msg = compare(sdf, fixed, con)
    assert ok, msg


def test_matching_int_widths_pass(spark):
    """Width differences within a kind stay tolerated (int32 vs int64)."""
    con = duckdb.connect()
    sdf = spark.createDataFrame([(1, 15)], "id int, v long")
    ok, msg = compare(sdf, "SELECT CAST(1 AS BIGINT) AS id, CAST(15 AS INT) AS v", con)
    assert ok, msg
