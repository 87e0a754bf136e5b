"""The hash-prefixed duplicate window (levels.LEVEL1_DUPW_HASH) is a
physical sort-key layout change: partitionBy(xxhash64(payload),
site_no) + orderBy(payload struct, time) + null-safe struct equality
on the lagged row must produce exactly the rows the composite-key
window (partitionBy(site_no, *payload) + orderBy(time)) produces —
identical payloads stay contiguous inside the hash partition, a
different-payload neighbor means first-of-group in BOTH layouts, and
collisions are separated by the struct sort and fail the equality.
"""

from __future__ import annotations

import datetime as dt

import pytest

from cosmoz_data_pipeline_spark.domain import levels
from cosmoz_data_pipeline_spark.domain.synth import load_domain


@pytest.fixture()
def dupw_hash():
    shipped = levels.LEVEL1_DUPW_HASH

    def _set(on: bool):
        levels.LEVEL1_DUPW_HASH = on

    yield _set
    levels.LEVEL1_DUPW_HASH = shipped


def _l1_rows(spark, raw):
    out = levels.raw_to_level1(raw)
    return sorted(
        (tuple(r) for r in out.select(*sorted(out.columns)).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_identical_on_domain_corpus(spark, sf_dir, dupw_hash):
    raw = load_domain(spark, sf_dir)["raw_values"]
    dupw_hash(False)
    base = _l1_rows(spark, raw)
    assert base
    dupw_hash(True)
    assert _l1_rows(spark, raw) == base


def test_identical_with_null_payload_fields(spark, dupw_hash):
    # the synthetic domain has no null payload values, but the
    # reference's raw feed can — null-safe equality must group nulls
    # exactly like window PARTITION BY does (null == null for grouping)
    t0 = dt.datetime(2021, 1, 1)

    def row(i, minutes, count, battery, rain):
        return {
            "time": t0 + dt.timedelta(minutes=minutes),
            "site_no": 1,
            "flag": 0,
            "count": count,
            "pressure1": 950.0,
            "internal_temperature": None,  # null payload field
            "internal_humidity": 30.0,
            "battery": battery,
            "tube_temperature": 15.0,
            "tube_humidity": 20.0,
            "rain": rain,
            "vwc1": 1.0,
            "vwc2": 2.0,
            "vwc3": 3.0,
            "pressure2": 948.0,
            "external_temperature": 5.0,
            "external_humidity": 20.0,
        }

    rows = [
        row(0, 0, 1200, 12.0, 0.0),
        row(1, 10, 1200, 12.0, 0.0),   # identical payload, 10 min later: dup
        row(2, 45, 1200, 12.0, 0.0),   # identical payload, 35 min after prev: kept
        row(3, 50, 1200, 12.0, 1.0),   # different rain: not a dup
        row(4, 55, 1200, None, 0.0),   # null battery group, first: not a dup
        row(5, 60, 1200, None, 0.0),   # same null battery, 5 min: dup
    ]
    schema = (
        "time timestamp, site_no int, flag int, count bigint, "
        "pressure1 double, internal_temperature double, "
        "internal_humidity double, battery double, "
        "tube_temperature double, tube_humidity double, rain double, "
        "vwc1 double, vwc2 double, vwc3 double, pressure2 double, "
        "external_temperature double, external_humidity double"
    )
    raw = spark.createDataFrame(rows, schema)
    dupw_hash(False)
    base = _l1_rows(spark, raw)
    dupw_hash(True)
    hashed = _l1_rows(spark, raw)
    assert hashed == base
    # and pin the expected semantics, not just cross-variant identity:
    # minute 0 dropped (null prev_count), minute 10 dropped (29-min dup
    # of 0), minute 45 kept (35 min past its last identical row),
    # minute 50 kept (different rain), minute 55 kept (first of the
    # null-battery group), minute 60 dropped (5-min dup of 55)
    time_idx = sorted(levels.raw_to_level1(raw).columns).index("time")
    assert sorted(t[time_idx].minute for t in base) == [45, 50, 55]
