"""Oracle parity for the IVF two-level (coarse-group) assignment
branch. The driver's correctness corpora are small (K=22 at sf0.01,
K=44 at sf0.1), so with IVF_TWOLEVEL_MIN_K = 64 every driver gate run
exercises the FLAT assignment branch; this test builds a corpus big
enough (K=80 > 64, G=8) that both engines take the two-level path —
centroid grouping, per-vector top-R group probes, candidate-restricted
assignment — and runs the full registry query against the full DuckDB
oracle through the same strict compare the driver uses. Both branches
of the K-threshold CASE are thereby pinned end-to-end.

The corpus is clustered (80 tight clusters = K) so the assignment is
non-trivial: mis-grouping a centroid or probing the wrong groups would
move vectors across clusters and change the scored candidate set, not
just reorder it.
"""
from __future__ import annotations

import hashlib

import duckdb
import pytest

N_VECS = 6400
N_CLUSTERS = 80  # == isqrt(N_VECS) == K; > IVF_TWOLEVEL_MIN_K -> two-level
DIM = 64
NOISE = 3e-2


def _unit(key: str) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return h / 2**31 - 1.0


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf_twolevel"))
    rows = []
    for vec_id in range(N_VECS):
        c = vec_id % N_CLUSTERS
        v = [
            _unit(f"center{c}_{dd}") + NOISE * _unit(f"noise{vec_id}_{dd}")
            for dd in range(DIM)
        ]
        rows.append((vec_id, v, c))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_twolevel_branch_is_active(spark, corpus_dir):
    from math import isqrt

    from cosmoz_data_pipeline_spark.plans.catalog_ext import (
        IVF_TWOLEVEL_MIN_K,
        _ivf_train,
    )

    _, _, k, _ = _ivf_train(spark, corpus_dir)
    assert k == isqrt(N_VECS) and k >= IVF_TWOLEVEL_MIN_K, (
        f"fixture must force the two-level branch, got K={k}"
    )


def test_ivf_query_matches_oracle_on_twolevel_corpus(spark, corpus_dir):
    from cosmoz_data_pipeline_spark.plans import REGISTRY
    from tools.compare import compare

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{corpus_dir}/embeddings.parquet/*.parquet'"
    )
    q = REGISTRY["x_ann_ivf_topk"]
    ok, msg = compare(q.run(spark, corpus_dir), q.oracle, con)
    assert ok, msg


def test_ivf_train_matches_oracle_on_twolevel_corpus(spark, corpus_dir):
    from cosmoz_data_pipeline_spark.plans import REGISTRY
    from tools.compare import compare

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{corpus_dir}/embeddings.parquet/*.parquet'"
    )
    q = REGISTRY["x_ann_ivf_topk_train"]
    ok, msg = compare(q.run(spark, corpus_dir), q.oracle, con)
    assert ok, msg
