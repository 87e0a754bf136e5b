"""The coarse pre-verify screen (catalog_ext.NEARDUP_PRESCREEN_HEAD)
is a physical optimization: the Cauchy-Schwarz upper bound
(head_dot + tail_norm_a * tail_norm_b) / (nrm_a * nrm_b) dominates the
exact quantized cosine, so screening on it must never change the
output pair set — only how many candidates reach the full-vector
verify join. These tests pin that superset property end-to-end (query
output identical with the screen on/off) and unit-pin the bound
against exact cosines on adversarial vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmoz_data_pipeline_spark.functions import similarity as sim
from cosmoz_data_pipeline_spark.plans import REGISTRY, catalog_ext, release_persists


@pytest.fixture()
def prescreen(request):
    """Set the screen head width for one test, restoring the shipped
    module default (None = corpus-gated auto since round 10; head16
    where the >=128-partition gate engages) afterward."""
    shipped = catalog_ext.NEARDUP_PRESCREEN_HEAD

    def _set(h: int):
        catalog_ext.NEARDUP_PRESCREEN_HEAD = h

    yield _set
    catalog_ext.NEARDUP_PRESCREEN_HEAD = shipped


def _pairs(spark, sf_dir):
    rows = REGISTRY["x_embed_cosine_neardup"].run(spark, sf_dir).collect()
    release_persists()
    return {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}


@pytest.mark.parametrize("head", [8, 16])
def test_query_output_identical_with_screen(spark, sf_dir, prescreen, head):
    prescreen(0)  # unscreened reference pair set
    base = _pairs(spark, sf_dir)
    assert base, "corpus must produce near-dup pairs for this test to bite"
    prescreen(head)
    assert _pairs(spark, sf_dir) == base


def test_bound_dominates_exact_cosine(spark, prescreen):
    # adversarial shapes: all-head mass, all-tail mass, sign flips on
    # the boundary between head and tail, near-identical pair at the
    # threshold — the bound must be >= the exact quantized cosine for
    # every pair, so no pair the verify would keep can be screened out
    vs = [
        [1.0] * 8 + [0.0] * 8,
        [0.0] * 8 + [1.0] * 8,
        [0.5] * 16,
        [0.5] * 8 + [-0.5] * 8,
        [0.31] * 16,
        [0.31] * 15 + [0.29],
        [-0.2] * 4 + [0.4] * 12,
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "vec_id int, v array<double>"
    )
    q = df.select(
        "vec_id",
        sim.quantize(F.col("v")).alias("qv"),
    ).select("vec_id", "qv", sim.qnorm(F.col("qv")).alias("nrm"))
    h = 8
    head = F.slice("qv", 1, h)
    slim = q.select(
        "vec_id",
        head.alias("qh"),
        "nrm",
        F.sqrt(
            F.greatest(
                F.col("nrm") * F.col("nrm") - sim.idot(head, head).cast("double"),
                F.lit(0.0),
            )
        ).alias("tn"),
    )
    a = slim.select(
        F.col("vec_id").alias("ia"), F.col("qh").alias("ha"),
        F.col("nrm").alias("na"), F.col("tn").alias("ta"),
    )
    b = slim.select(
        F.col("vec_id").alias("ib"), F.col("qh").alias("hb"),
        F.col("nrm").alias("nb"), F.col("tn").alias("tb"),
    )
    full_a = q.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    full_b = q.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    got = (
        a.crossJoin(b)
        .where(F.col("ia") < F.col("ib"))
        .join(full_a, "ia")
        .join(full_b, "ib")
        .select(
            (
                (
                    sim.idot(F.col("ha"), F.col("hb")).cast("double")
                    + F.col("ta") * F.col("tb")
                )
                / (F.col("na") * F.col("nb"))
            ).alias("ub"),
            (
                sim.idot(F.col("qa"), F.col("qb")).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert r["ub"] >= r["cos"] - 1e-12, (r["ub"], r["cos"])


def test_screen_actually_screens(spark, sf_dir, prescreen):
    # evidence the screen is not a no-op: at least one candidate pair
    # must be eliminated before the verify join on the test corpus
    from cosmoz_data_pipeline_spark.plans.catalog_ext import (
        _neardup_cands,
        _neardup_prescreen,
    )

    vecs, cand = _neardup_cands(spark, sf_dir)
    n_all = cand.count()
    n_kept = _neardup_prescreen(vecs, cand, 16).count()
    release_persists()
    assert n_kept < n_all, (n_kept, n_all)


@pytest.fixture()
def screen_dot():
    """Force the screen's head-dot implementation for one test
    (NEARDUP_SCREEN_DOT, round 11), restoring the shipped default."""
    shipped = catalog_ext.NEARDUP_SCREEN_DOT

    def _set(v: str):
        catalog_ext.NEARDUP_SCREEN_DOT = v

    yield _set
    catalog_ext.NEARDUP_SCREEN_DOT = shipped


def test_screen_dot_variants_identical(spark, sf_dir, prescreen, screen_dot):
    # the three head-dot implementations (int32 fold / bigint raw fold
    # / bigint unrolled expression) compute the identical integer sum,
    # so the query output must be identical under each — with the
    # screen forced ON so the variant actually executes
    prescreen(16)
    outs = []
    for v in ("fold", "raw", "unrolled"):
        screen_dot(v)
        outs.append(_pairs(spark, sf_dir))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0]
