"""Round-6 advisor fix: two-level IVF assignment must never drop a
vector on a duplicate-heavy corpus.

The hazard: reps are the centroids j < G. If rep g1 has quantized
coordinates identical to a lower rep g0 (guaranteed here — the whole
corpus is exact copies of 4 distinct vectors, so the K seed centroids
cycle those 4 values and reps 4..7 duplicate reps 0..3, and Lloyd
iterations are fix-points on this corpus so the duplication survives
training), the old min-gid grouping emptied group g1. The fix pins
each rep centroid into its OWN group unconditionally
(catalog_ext._ivf_candidates / the oracle's cgrp CASE), making every
group non-empty by construction instead of by a tie-break-ordering
argument that a refactor could silently break.

Asserted: (a) the two-level branch is active and duplicate reps
really exist, (b) the checkpointed inverted-list assignment covers
every vector exactly once — count == N, distinct vec_id == N —
(c) the full registry query still passes the strict oracle compare on
this corpus (both engines apply the identical pin rule).
"""
from __future__ import annotations

import hashlib

import duckdb
import pytest

N_VECS = 4096
N_CENTERS = 4  # whole corpus = exact copies of these 4 vectors
DIM = 64


def _unit(key: str) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return h / 2**31 - 1.0


@pytest.fixture(scope="module")
def dup_corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf_dups"))
    centers = [
        [_unit(f"dupcenter{c}_{dd}") for dd in range(DIM)]
        for c in range(N_CENTERS)
    ]
    rows = [
        (vec_id, centers[vec_id % N_CENTERS], vec_id % N_CENTERS)
        for vec_id in range(N_VECS)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_branch_active_and_reps_duplicated(spark, dup_corpus_dir):
    from math import isqrt

    from cosmoz_data_pipeline_spark.plans.catalog_ext import (
        IVF_TWOLEVEL_MIN_K,
        _ivf_train,
    )

    _, cent_df, k, _ = _ivf_train(spark, dup_corpus_dir)
    g = isqrt(k)
    assert k == isqrt(N_VECS) and k >= IVF_TWOLEVEL_MIN_K
    # the degenerate premise really holds: among the G rep centroids
    # there are only N_CENTERS distinct coordinate vectors
    reps = cent_df.where(cent_df.j < g).select("wa").distinct().count()
    assert reps == N_CENTERS, f"expected duplicated reps, got {reps} distinct"


def test_assignment_covers_every_vector(spark, dup_corpus_dir):
    from cosmoz_data_pipeline_spark.plans.catalog_ext import _ivf_train

    _, _, _, asg_df = _ivf_train(spark, dup_corpus_dir)
    n = asg_df.count()
    n_distinct = asg_df.select("vec_id").distinct().count()
    assert n == N_VECS, f"index lost vectors: {n} != {N_VECS}"
    assert n_distinct == N_VECS, "duplicate assignments for one vec_id"


def test_query_matches_oracle_on_dup_corpus(spark, dup_corpus_dir):
    from cosmoz_data_pipeline_spark.plans import REGISTRY
    from tools.compare import compare

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{dup_corpus_dir}/embeddings.parquet/*.parquet'"
    )
    q = REGISTRY["x_ann_ivf_topk"]
    ok, msg = compare(q.run(spark, dup_corpus_dir), q.oracle, con)
    assert ok, msg
