"""Durable IVF index tables (catalog_ext.write_ivf_index /
load_ivf_index): a second session must be able to open a written
index and search it without retraining. Same-session stand-in: clear
the session memo (what a new application starts with), load, and
prove (a) the search output is identical to the fresh-trained,
oracle-gated result, and (b) no training superstep runs on the loaded
path.
"""

from __future__ import annotations

import os

import pytest

from cosmoz_data_pipeline_spark.plans import catalog_ext as CE
from cosmoz_data_pipeline_spark.plans.registry import REGISTRY, release_persists


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.fixture()
def clean_memo():
    CE._IVF_CENTROIDS.clear()
    yield
    CE._IVF_CENTROIDS.clear()
    release_persists()


def test_index_roundtrip_search_identical(spark, sf_dir, tmp_path, clean_memo, monkeypatch):
    fresh = _rows(REGISTRY["x_ann_ivf_topk"].run(spark, sf_dir))
    assert fresh
    idx = str(tmp_path / "ivf_index")
    CE.write_ivf_index(spark, sf_dir, idx)
    release_persists()

    # the layout a probed search prunes on: one directory per cluster
    parts = [p for p in os.listdir(f"{idx}/invlists.parquet") if p.startswith("cluster=")]
    assert len(parts) > 1

    # meta holds the documented (k, n_clusters_nonempty) row (ADVICE
    # r10: the column was documented but not written) — and the
    # nonempty count must agree with the on-disk partition layout
    meta = spark.read.parquet(f"{idx}/meta.parquet").collect()[0]
    assert set(meta.asDict()) == {"k", "n_clusters_nonempty"}
    assert meta["n_clusters_nonempty"] == len(parts)

    # a fresh session: no memo, no executor-side checkpoint blocks
    CE._IVF_CENTROIDS.clear()
    cent, k, asg = CE.load_ivf_index(spark, sf_dir, idx)
    assert k == cent.count() or k >= 1  # k is the trained K scalar

    # loaded search must never train: every training superstep goes
    # through _iter_checkpoint, so a call on this path is a retrain
    def _no_train(df, eager=True):
        raise AssertionError("loaded index must not retrain")

    monkeypatch.setattr(CE, "_iter_checkpoint", _no_train)
    got = _rows(REGISTRY["x_ann_ivf_topk_search"].run(spark, sf_dir))
    assert got == fresh


def test_write_from_cold_and_warm_identical(spark, sf_dir, tmp_path, clean_memo):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    CE.write_ivf_index(spark, sf_dir, a)  # trains (cold memo)
    CE.write_ivf_index(spark, sf_dir, b)  # re-writes from the warm memo
    ca = _rows(spark.read.parquet(f"{a}/centroids.parquet"))
    cb = _rows(spark.read.parquet(f"{b}/centroids.parquet"))
    assert ca == cb
    ia = _rows(spark.read.parquet(f"{a}/invlists.parquet"))
    ib = _rows(spark.read.parquet(f"{b}/invlists.parquet"))
    assert ia == ib
