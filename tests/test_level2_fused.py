"""LEVEL2_FUSED_TEMPORAL (domain/levels.py) is a physical reshape
only: resolving level2's hour-grain intensity match, day-grain SILO
pick and both as-of fallbacks through ONE (site[, week-bucket])
shuffle must produce row-for-row what the three-join shape produces —
including hour gaps (backward as-of), the late-starting site 3
(forward as-of), the intensity-less site 8 (corr = 1.0), silo days
missing / at 13:00, and as-of values carried across week buckets.

Corpus: sf0.01 (spans ~17 days = 3 week-buckets, so the fused
bucketed variant's cross-bucket as-of carry is actually exercised;
sf0.001 fits in one bucket).
"""

from __future__ import annotations

import pytest

from cosmoz_data_pipeline_spark.domain import levels
from cosmoz_data_pipeline_spark.domain.synth import load_domain
from cosmoz_data_pipeline_spark.operators import asof

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(
        (tuple(r) for r in df.select(*sorted(df.columns)).collect()),
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )


@pytest.fixture()
def fused_flags():
    shipped = (levels.LEVEL2_FUSED_TEMPORAL, asof.ASOF_BUCKETED)

    def _set(fused, asof_bucketed):
        levels.LEVEL2_FUSED_TEMPORAL = fused
        asof.ASOF_BUCKETED = asof_bucketed

    yield _set
    levels.LEVEL2_FUSED_TEMPORAL, asof.ASOF_BUCKETED = shipped


def test_level2_fused_identity_on_domain_corpus(spark, fused_flags):
    d = load_domain(spark, SF_DIR)
    args = (d["raw_values"], d["intensity"], d["silo_data"], d["all_stations"])

    fused_flags(False, False)
    base2 = _rows(levels.run_pipeline(*args)["level2"])
    base4 = _rows(levels.run_pipeline(*args)["level4"])
    assert base2 and base4

    # fused + plain per-site windows
    fused_flags(True, False)
    assert _rows(levels.run_pipeline(*args)["level2"]) == base2

    # fused + bucketed windows (the at-scale shape): cross-bucket
    # as-of carry + in-bucket pick gates, end to end through level4
    fused_flags(True, True)
    assert _rows(levels.run_pipeline(*args)["level2"]) == base2
    assert _rows(levels.run_pipeline(*args)["level4"]) == base4


def test_level2_fused_pick_gates_edge_times(spark, fused_flags):
    """Fact rows exactly AT an hour/day start must see their pick row
    (picks order before probes at equal time), and a fused day gate
    must not leak a neighboring day's SILO row across midnight."""
    raw = spark.createDataFrame(
        [
            # site 1: reading exactly at hour + day start
            ("2021-01-04 00:00:00", 1),
            # site 1: reading in an hour with no intensity row
            ("2021-01-04 05:10:00", 1),
            # site 1: reading the day after the only silo day
            ("2021-01-05 00:00:00", 1),
        ],
        "t string, site_no int",
    ).selectExpr(
        "CAST(t AS TIMESTAMP) AS time",
        "site_no",
        "CAST(0 AS INT) AS flag",
        "CAST(1500 AS BIGINT) AS count",
        "9.6e2 AS pressure1",
        "2.1e1 AS internal_temperature",
        "3.1e1 AS internal_humidity",
        "1.2e1 AS battery",
        "1.6e1 AS tube_temperature",
        "2.1e1 AS tube_humidity",
        "0e0 AS rain",
        "1e0 AS vwc1",
        "1e0 AS vwc2",
        "1e0 AS vwc3",
        "9.5e2 AS pressure2",
        "1e1 AS external_temperature",
        "5e1 AS external_humidity",
    )
    intensity = spark.createDataFrame(
        [("2021-01-04 00:00:00", 1, 120.0)],
        "t string, site_no int, intensity double",
    ).selectExpr("CAST(t AS TIMESTAMP) AS time", "site_no", "intensity")
    silo = spark.createDataFrame(
        [("2021-01-04 06:00:00", 1, 15.0, 45.0)],
        "t string, site_no int, average_temperature double, average_humidity double",
    ).selectExpr(
        "CAST(t AS TIMESTAMP) AS time",
        "site_no",
        "average_temperature",
        "average_humidity",
    )
    stations = spark.createDataFrame(
        [(1, 6.5e-3, 9.55e2, 1.17e2, 0.61, 1.02)],
        "site_no int, beta double, ref_pressure double, "
        "ref_intensity double, latit_scaling double, elev_scaling double",
    )

    def run():
        # raw rows here are already deduped/flagged level1-shaped input
        return _rows(levels.level1_to_level2(raw, intensity, silo, stations))

    fused_flags(False, False)
    base = run()
    fused_flags(True, False)
    assert run() == base
    fused_flags(True, True)
    assert run() == base
