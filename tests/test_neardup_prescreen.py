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


def test_screen_dot_variants_identical_on_ragged_vectors(spark, screen_dot):
    # round 12 (ADVICE r11): a qv SHORTER than the head width h slices
    # to a short array; the raw/unrolled dots read h positional terms,
    # so without the slim-build zero-padding a missing term would
    # propagate NULL through ub and silently DROP the pair where the
    # fold's per-product coalesce kept it. All three variants must
    # keep the identical pair set on ragged input — and near-identical
    # short vectors must actually SURVIVE the screen.
    from cosmoz_data_pipeline_spark.plans.catalog_ext import _neardup_prescreen

    h = 16
    vs = [
        (1, [0.4] * 4),                   # shorter than h
        (2, [0.4] * 4),                   # identical twin: cosine 1.0
        (3, [0.4] * 24),                  # longer than h
        (4, [0.4] * 24),
        (5, [0.4] * 16),                  # exactly h
        (6, [0.4] * 3 + [-0.4]),          # short, dissimilar to 1/2
    ]
    vecs = (
        spark.createDataFrame(vs, "vec_id int, v array<double>")
        .select("vec_id", sim.quantize(F.col("v")).alias("qv"))
        .select("vec_id", "qv", sim.qnorm(F.col("qv")).alias("nrm"))
    )
    ids = [i for i, _ in vs]
    cand = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "vec_a int, vec_b int"
    )
    kept = {}
    for v in ("fold", "raw", "unrolled"):
        screen_dot(v)
        kept[v] = {
            (r["vec_a"], r["vec_b"])
            for r in _neardup_prescreen(vecs, cand, h).collect()
        }
    assert kept["fold"] == kept["raw"] == kept["unrolled"]
    # the ragged twins' bound is cosine 1.0 >= keep threshold: the
    # pair the null-propagation bug dropped must be present
    assert (1, 2) in kept["fold"]
    assert (3, 4) in kept["fold"]


def test_count_memo_pair_refills_together(spark, sf_dir):
    # round 12 (ADVICE r11): clearing only the BASE count memo while
    # the aug memo stays populated must not KeyError (the aug memo
    # recomputes and refills both), and clear_counts() drops all four
    from cosmoz_data_pipeline_spark.plans import catalog_ext as ce

    n_docs = ce._docs_count(spark, sf_dir)
    n_emb = ce._emb_count(spark, sf_dir)
    ce._DOCS_COUNT.clear()
    ce._EMB_COUNT.clear()
    assert ce._docs_count(spark, sf_dir) == n_docs
    assert ce._emb_count(spark, sf_dir) == n_emb
    ce.clear_counts()
    assert not ce._DOCS_AUG_COUNT and not ce._DOCS_COUNT
    assert not ce._EMB_AUG_COUNT and not ce._EMB_COUNT
    assert ce._docs_count(spark, sf_dir) == n_docs
