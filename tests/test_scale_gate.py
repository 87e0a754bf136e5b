"""`pytest -m scale_gate` — the K>=64 IVF two-level branch against the
REAL x10 scale corpus through the driver-shaped strict compare
(VERDICT r7 task 3, promoting what was previously builder discipline
plus the synthetic test_ivf_twolevel_parity corpus into a gate over
the same corpus the scale sweep publishes numbers for).

The driver correctness corpora stop at K=44 (sf0.1), below
IVF_TWOLEVEL_MIN_K=64, so the two-level centroid-group assignment is
never exercised by the driver gate. The x10 corpus (~20k vectors,
K=isqrt(N)~141) takes the two-level path in both engines; this module
runs x_ann_ivf_topk + _train + _search end-to-end against their DuckDB
oracles via tools.compare.compare — exactly tools/check_all.py's gate.

Skips (rather than fails) when /tmp/cosmoz_scale_x10 is absent or its
generator marker is stale: the corpus is a build artifact of
tools/scale_bench.py, not of the test suite, and regenerating ~10x
tables inside pytest would hide a multi-minute corpus build in a test.
"""
from __future__ import annotations

import json
import os

import pytest

from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists

pytestmark = pytest.mark.scale_gate

X10_DIR = "/tmp/cosmoz_scale_x10"
IVF_QUERIES = ("x_ann_ivf_topk", "x_ann_ivf_topk_train", "x_ann_ivf_topk_search")


def _x10_marker_ok() -> bool:
    from tools.scale_corpus import ALL_TABLES, marker

    try:
        with open(os.path.join(X10_DIR, "corpus_meta.json")) as f:
            have = json.load(f)
    except (OSError, ValueError):
        return False
    want = marker(10, ALL_TABLES)
    return (
        have.get("generator_version") == want["generator_version"]
        and have.get("mult") == want["mult"]
        and have.get("base") == want["base"]
        and {"embeddings"} <= set(have.get("tables", []))
    )


x10_required = pytest.mark.skipif(
    not _x10_marker_ok(),
    reason="x10 scale corpus absent/stale (run tools/scale_bench.py to build it)",
)


@x10_required
def test_x10_takes_twolevel_branch(spark):
    from cosmoz_data_pipeline_spark.plans.catalog_ext import (
        IVF_TWOLEVEL_MIN_K,
        _ivf_train,
    )

    try:
        _, _, k, _ = _ivf_train(spark, X10_DIR)
    finally:
        release_persists()
    assert k >= IVF_TWOLEVEL_MIN_K, (
        f"x10 corpus yields K={k} < {IVF_TWOLEVEL_MIN_K}: the gate is not "
        f"exercising the two-level assignment branch it exists for"
    )


@x10_required
@pytest.mark.parametrize("name", IVF_QUERIES)
def test_ivf_oracle_parity_at_x10(spark, name):
    from tools.compare import compare, duckdb_connection

    con = duckdb_connection(X10_DIR)
    q = REGISTRY[name]
    assert q.oracle is not None
    try:
        ok, msg = compare(q.run(spark, X10_DIR), q.oracle, con)
    finally:
        release_persists()
    assert ok, f"{name} at x10: {msg}"
