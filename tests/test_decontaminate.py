"""Ground-truth test for x_decontaminate: recompute the train-vs-eval
word-3-gram overlap in plain Python from the raw parquet and compare
pair-for-pair. Also documents the collision property: at fixture scale
the 32-bit shingle hash space has no collisions, so hashed overlap ==
true string-shingle overlap.
"""
from __future__ import annotations

import duckdb

from cosmoz_data_pipeline_spark.plans.catalog_ext import (
    DECON_EVAL_SOURCE,
    q_decontaminate,
)


def _shingle_sets(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT doc_id, source, lower(trim(text)) AS t FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    import re

    out = {}
    for doc_id, source, t in rows:
        toks = re.split(r"\s+", t)
        out[doc_id] = (source, {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    return out

def test_decontaminate_matches_python_ground_truth(spark, sf_dir):
    docs = _shingle_sets(sf_dir)
    ev = {d: s for d, (src, s) in docs.items() if src == DECON_EVAL_SOURCE}
    tr = {d: s for d, (src, s) in docs.items() if src != DECON_EVAL_SOURCE}
    truth = {
        (td, ed): len(ts & es)
        for td, ts in tr.items()
        for ed, es in ev.items()
        if ts & es
    }

    got = {
        (r["train_doc"], r["eval_doc"]): (r["n_shared"], r["n_train_shingles"])
        for r in q_decontaminate(spark, sf_dir).collect()
    }
    assert set(got) == set(truth)
    for pair, n in truth.items():
        n_shared, n_train = got[pair]
        assert n_shared == n, f"{pair}: hashed overlap {n_shared} != true {n}"
        assert n_train == len(tr[pair[0]])
    spark.catalog.clearCache()
