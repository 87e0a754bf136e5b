"""Oracle parity smoke at sf0.001: every registered query with an
oracle must match DuckDB exactly (the driver's gate runs the same
comparison at sf0.01)."""

from __future__ import annotations

import pytest

from cosmoz_data_pipeline_spark.plans import REGISTRY
from tools.compare import compare, duckdb_connection

# the fast subset for -x -q CI; tools/check_all.py covers everything
FAST = [
    "s01_scan_pushdown",
    "a01_pricing_summary",
    "j01_dim_join_rollup",
    "w01_lag_delta",
    "j05_asof_backward_join",
    "j07_windowed_dedup",
    "level1",
    "level1_scan_local",
    "level3",
    "x_dedup_exact",
    "x_text_fingerprint",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    assert q.oracle is not None
    ok, msg = compare(q.run(spark, sf_dir), q.oracle, duck)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_budget_records_all_operators():
    """The driver records only the first DRIVER_QUERY_BUDGET queries.
    The tail past the budget must contain ONLY the pinned
    instrumentation views (IVF train/search bench split) whose
    operator coverage is already carried by a recorded query — any
    other name in the tail is silent coverage loss."""
    from cosmoz_data_pipeline_spark.plans import DRIVER_QUERY_BUDGET, _TAIL

    names = list(REGISTRY)
    assert names[DRIVER_QUERY_BUDGET:] == _TAIL
    assert "x_ann_ivf_topk" in names[:DRIVER_QUERY_BUDGET]


@pytest.mark.parametrize(
    "name",
    ["x_ann_ivf_topk_train", "x_ann_ivf_topk_search", "x_multimodal_decode_ppm"],
)
def test_unrecorded_tail_matches_oracle(spark, sf_dir, duck, name):
    """The tail queries sit past the driver budget, so the driver's
    CORRECTNESS artifact never checks them — this test is their
    oracle gate."""
    q = REGISTRY[name]
    assert q.oracle is not None
    ok, msg = compare(q.run(spark, sf_dir), q.oracle, duck)
    assert ok, f"{name}: {msg}"