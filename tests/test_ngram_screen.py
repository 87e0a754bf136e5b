"""The size-ratio screen (catalog_ext.NGRAM_SIZE_SCREEN) bounds
Jaccard by min(|A|,|B|)/max(|A|,|B|) — a physical filter that must
never change x_dedup_ngram_jaccard's output pair set, only how many
candidates reach the shingle-array verify join."""

from __future__ import annotations

import pytest

from cosmoz_data_pipeline_spark.plans import REGISTRY, catalog_ext, release_persists


@pytest.fixture()
def size_screen():
    shipped = catalog_ext.NGRAM_SIZE_SCREEN

    def _set(on: bool):
        catalog_ext.NGRAM_SIZE_SCREEN = on

    yield _set
    catalog_ext.NGRAM_SIZE_SCREEN = shipped


def _pairs(spark, sf_dir):
    rows = REGISTRY["x_dedup_ngram_jaccard"].run(spark, sf_dir).collect()
    release_persists()
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}


def test_output_identical_with_screen(spark, sf_dir, size_screen):
    size_screen(False)
    base = _pairs(spark, sf_dir)
    assert base, "corpus must produce near-dup pairs for this test to bite"
    size_screen(True)
    assert _pairs(spark, sf_dir) == base


def test_bound_is_tight_at_threshold(spark):
    # two sets sized 6 and 10 share all 6: J = 6/10 = 0.6 — exactly at
    # threshold, ratio 0.6 must NOT be screened out (the 1e-9 slack)
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        (F.lit(6.0) / F.lit(10.0)).alias("ratio"),
    )
    kept = df.where(F.col("ratio") >= F.lit(catalog_ext._NGRAM_KEEP)).count()
    assert kept == 1
