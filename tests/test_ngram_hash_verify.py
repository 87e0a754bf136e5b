"""The audited hash-set verify (catalog_ext.NGRAM_HASH_VERIFY, round
12) is a physical optimization: once a per-corpus audit proves the
gram hash injective over the corpus's distinct shingle strings, the
exact-verify join ships int64 hash sets instead of KB-scale string
arrays and the hash-set Jaccard equals the string-set Jaccard bit for
bit. These tests pin output identity with the hash verify on/off, and
— via NGRAM_HASH_MOD — that a FAILING audit (forced collisions) fires
the loud warning and falls back to the exact string verify rather
than producing a wrong answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmoz_data_pipeline_spark.plans import REGISTRY, catalog_ext, release_persists


@pytest.fixture()
def hash_verify():
    """Force the verify shape (and optionally a tiny hash modulus) for
    one test, restoring shipped defaults and the audit memo after."""
    shipped = (catalog_ext.NGRAM_HASH_VERIFY, catalog_ext.NGRAM_HASH_MOD)

    def _set(on: bool | None, mod: int | None = None):
        catalog_ext.NGRAM_HASH_VERIFY = on
        catalog_ext.NGRAM_HASH_MOD = mod

    yield _set
    catalog_ext.NGRAM_HASH_VERIFY, catalog_ext.NGRAM_HASH_MOD = shipped
    catalog_ext._NGRAM_INJECTIVE.clear()


def _pairs(spark, sf_dir):
    rows = REGISTRY["x_dedup_ngram_jaccard"].run(spark, sf_dir).collect()
    release_persists()
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}


def test_output_identical_with_hash_verify(spark, sf_dir, hash_verify):
    hash_verify(False)
    base = _pairs(spark, sf_dir)
    assert base, "corpus must produce near-dup pairs for this test to bite"
    hash_verify(True)
    assert _pairs(spark, sf_dir) == base
    # the audit must have certified the full-width hash on this corpus
    assert catalog_ext._NGRAM_INJECTIVE == {(sf_dir.rstrip("/"), None): True}


@pytest.mark.parametrize("mod", [97, 7])
def test_forced_collisions_fall_back_exactly(
    spark, sf_dir, hash_verify, mod, capfd
):
    # a tiny modulus makes distinct shingles collide for certain; the
    # audit must fail LOUDLY and the query must fall back to the
    # string verify — output identical, never silently wrong
    hash_verify(False)
    base = _pairs(spark, sf_dir)
    hash_verify(True, mod)
    capfd.readouterr()
    assert _pairs(spark, sf_dir) == base
    assert "gram-hash collision" in capfd.readouterr().err
    assert catalog_ext._NGRAM_INJECTIVE[(sf_dir.rstrip("/"), mod)] is False


def test_audit_detects_collisions_and_memoizes(spark, sf_dir, hash_verify):
    from cosmoz_data_pipeline_spark.plans.catalog_ext import (
        _docs_aug,
        _minhash_sigs_kernel,
        _ngram_hash_injective,
    )

    per_doc = _minhash_sigs_kernel(_docs_aug(spark, sf_dir), with_set=True)
    hash_verify(True, None)
    assert _ngram_hash_injective(spark, sf_dir, per_doc) is True
    hash_verify(True, 7)
    assert _ngram_hash_injective(spark, sf_dir, per_doc) is False
    # memoized: flipping the module state back must not reuse the
    # wrong key (keys carry the modulus)
    hash_verify(True, None)
    assert _ngram_hash_injective(spark, sf_dir, per_doc) is True
    release_persists()


def test_hash_jaccard_equals_string_jaccard_under_injectivity(spark):
    # unit pin of the equivalence the audit certifies: on any corpus
    # where the hash is injective, |h(A) n h(B)| == |A n B| and sizes
    # match, so the two Jaccards are the same integers divided the
    # same way
    from cosmoz_data_pipeline_spark.functions import text as tx
    from cosmoz_data_pipeline_spark.plans.catalog_ext import _gram_hash

    df = spark.createDataFrame(
        [
            (["a b c", "b c d", "c d e"], ["b c d", "c d e", "x y z"]),
            (["q"], ["q"]),
            (["m n o", "n o p"], ["z z z"]),
        ],
        "sa array<string>, sb array<string>",
    )
    got = df.select(
        tx.jaccard(F.col("sa"), F.col("sb")).alias("j_str"),
        tx.jaccard(
            F.transform("sa", _gram_hash), F.transform("sb", _gram_hash)
        ).alias("j_hash"),
    ).collect()
    for r in got:
        assert r["j_str"] == r["j_hash"]
