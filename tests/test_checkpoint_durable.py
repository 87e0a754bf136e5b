"""The 100 TB deployment switch for iterative loops: when
``spark.cosmoz.checkpoint.dir`` is set, every superstep checkpoint in
the connected-components and IVF-training loops goes to RELIABLE
storage (df.checkpoint) instead of executor-local blocks — executor
loss mid-loop must not kill a multi-superstep job. The switch is a
session conf, so results must be bit-identical either way."""

from __future__ import annotations

import os


def test_durable_checkpoint_matches_local(spark, sf_dir, tmp_path):
    from cosmoz_data_pipeline_spark.plans import release_persists
    from cosmoz_data_pipeline_spark.plans import catalog_ext
    from cosmoz_data_pipeline_spark.plans.catalog_ext import q_dedup_components

    baseline = sorted(
        (r["doc_id"], r["component"], r["component_size"])
        for r in q_dedup_components(spark, sf_dir).collect()
    )
    release_persists()

    ckdir = str(tmp_path / "ck")
    spark.conf.set("spark.cosmoz.checkpoint.dir", ckdir)
    catalog_ext._IVF_CENTROIDS.clear()  # force IVF retrain under the conf
    try:
        durable = sorted(
            (r["doc_id"], r["component"], r["component_size"])
            for r in q_dedup_components(spark, sf_dir).collect()
        )
        # the loop really checkpointed into the reliable dir
        found = [
            os.path.join(dp, f)
            for dp, _dn, fn in os.walk(ckdir)
            for f in fn
        ]
        assert found, "no reliable checkpoint files written"
        assert durable == baseline
        # IVF training takes the same switch
        ivf = catalog_ext.q_ann_ivf_topk(spark, sf_dir)
        assert ivf.count() > 0
    finally:
        spark.conf.unset("spark.cosmoz.checkpoint.dir")
        catalog_ext._IVF_CENTROIDS.clear()
        release_persists()
        spark.catalog.clearCache()
