"""LEVEL1_DUP_SUBSET (domain/levels.py) is a physical reshape only:
prev_count + a ±29-min same-hash candidate screen through one
(site, week-bucket) exchange, with the original exact duplicate
window run on the candidate subset, must produce row-for-row what the
two-window shape produces — including duplicates at bucket edges
(prev/next-bucket hash sets), chains of duplicates, >29-min
same-payload pairs (kept), near-duplicates that differ in one field
(kept), and equal-time rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmoz_data_pipeline_spark.domain import levels
from cosmoz_data_pipeline_spark.domain.synth import load_domain
from cosmoz_data_pipeline_spark.operators.bucketed_window import BUCKET_SECS

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(
        (tuple(r) for r in df.select(*sorted(df.columns)).collect()),
        key=lambda t: tuple((x is None, str(type(x)), x) for x in t),
    )


@pytest.fixture()
def dup_flags():
    shipped = (
        levels.LEVEL1_DUP_SUBSET,
        levels.LEVEL1_SEQ_BUCKETED,
        levels.LEVEL1_DUPW_HASH,
    )

    def _set(subset, seq=None, dupw=None):
        levels.LEVEL1_DUP_SUBSET = subset
        levels.LEVEL1_SEQ_BUCKETED = seq
        levels.LEVEL1_DUPW_HASH = dupw

    yield _set
    (
        levels.LEVEL1_DUP_SUBSET,
        levels.LEVEL1_SEQ_BUCKETED,
        levels.LEVEL1_DUPW_HASH,
    ) = shipped


def test_level1_dup_subset_identity_on_domain_corpus(spark, dup_flags):
    d = load_domain(spark, SF_DIR)
    # baseline = the small-scale shipped shape
    dup_flags(False, False, False)
    base = _rows(levels.raw_to_level1(d["raw_values"]))
    assert base
    dup_flags(True)
    assert _rows(levels.raw_to_level1(d["raw_values"])) == base
    # and the at-scale baseline variant (bucketed lag + hash window)
    dup_flags(False, True, True)
    assert _rows(levels.raw_to_level1(d["raw_values"])) == base


def test_level1_dup_subset_bucket_edges_and_chains(spark, dup_flags):
    """Adversarial grid: duplicates straddling a week-bucket edge in
    both directions, a >29-min same-payload pair, an equal-payload
    chain, an equal-time pair, and a low-battery flag row."""
    b = 3 * BUCKET_SECS  # an arbitrary bucket boundary (epoch secs)
    rows = []

    def add(t, site, count, battery=12.0, tag=1.0):
        rows.append((t, site, 0, count, battery, tag))

    # same-payload pair straddling the boundary, 20 min apart -> dup
    add(b - 600, 1, 1500), add(b + 600, 1, 1500)
    # same payload, 40 min apart across the boundary -> kept
    add(b - 1200, 2, 1600), add(b + 1200, 2, 1600)
    # forward-edge case: row just BEFORE the boundary whose duplicate
    # source is after it (screen needs the next-bucket head set)
    add(b - 60, 3, 1700), add(b + 900, 3, 1700)
    # in-bucket chain: t, +20m, +40m (each consecutive gap <=29m)
    add(b + 7200, 4, 1800), add(b + 8400, 4, 1800), add(b + 9600, 4, 1800)
    # equal-time same-payload pair
    add(b + 20000, 5, 1900), add(b + 20000, 5, 1900)
    # same count, different battery -> NOT a duplicate
    add(b + 30000, 6, 2000, battery=11.0), add(b + 31200, 6, 2000, battery=12.5)
    # sequence context rows so prev_count is non-null for the cases
    for t, s in ((b - 3000, 1), (b - 3600, 2), (b - 2400, 3), (b + 6000, 4),
                 (b + 18000, 5), (b + 28000, 6)):
        add(t, s, 1000 + s)

    raw = spark.createDataFrame(
        rows, "secs long, site_no int, flag int, count long, battery double, vwc1 double"
    ).select(
        F.col("secs").cast("timestamp").alias("time"),
        "site_no",
        "flag",
        "count",
        F.lit(950.0).alias("pressure1"),
        F.lit(21.0).alias("internal_temperature"),
        F.lit(31.0).alias("internal_humidity"),
        "battery",
        F.lit(16.0).alias("tube_temperature"),
        F.lit(21.0).alias("tube_humidity"),
        F.lit(0.0).alias("rain"),
        "vwc1",
        F.lit(1.0).alias("vwc2"),
        F.lit(1.0).alias("vwc3"),
        F.lit(949.0).alias("pressure2"),
        F.lit(10.0).alias("external_temperature"),
        F.lit(50.0).alias("external_humidity"),
    )

    dup_flags(False, False, False)
    base = _rows(levels.raw_to_level1(raw))
    dup_flags(True)
    fused = _rows(levels.raw_to_level1(raw))
    assert fused == base
    # sanity on the scenario itself — assert the specific kept/dropped
    # (site, epoch-sec) outcomes, not just "something dropped"
    kept = [
        (r["s"], r["t"])
        for r in levels.raw_to_level1(raw)
        .select(F.col("site_no").alias("s"), F.unix_timestamp("time").alias("t"))
        .collect()
    ]
    kept_set = set(kept)
    assert len(kept) == len(kept_set)  # equal-time dup pair collapsed to one
    # 20-min straddler: first kept, duplicate dropped
    assert (1, b - 600) in kept_set and (1, b + 600) not in kept_set
    # 40-min same-payload pair: both kept (outside the 29-min window)
    assert (2, b - 1200) in kept_set and (2, b + 1200) in kept_set
    # forward-edge straddler (16 min): duplicate after the boundary dropped
    assert (3, b - 60) in kept_set and (3, b + 900) not in kept_set
    # chain reduced to its head
    assert (4, b + 7200) in kept_set
    assert (4, b + 8400) not in kept_set and (4, b + 9600) not in kept_set
    # equal-time pair: exactly one survivor
    assert (5, b + 20000) in kept_set
    # same count but different battery: NOT duplicates, both kept
    assert (6, b + 30000) in kept_set and (6, b + 31200) in kept_set
