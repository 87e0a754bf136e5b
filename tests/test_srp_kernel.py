"""SRP_KERNEL (functions/similarity.py) swaps the interpreted
per-(vector, band) HOF projection fold for an Arrow/numpy matmul
kernel (round 11 — the round-10 stage probe localized 69 % of
x_embed_cosine_neardup's x1000 wall to this fold). Flipping it must
leave every (id, band, bucket) row bit-identical: the float64 matmul
is exact integer arithmetic below the 2^53 partial-sum envelope and
the kernel falls back to an exact int64 matmul beyond it, so the only
risk surfaces are the edge semantics the fold gets from idot's
null-coalescing — null elements, whole-null vectors, empty and ragged
arrays — and the sign boundary (s == 0 contributes no bit). These
tests pin all of them variant-vs-variant, plus end-to-end query
identity on both SRP consumers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from cosmoz_data_pipeline_spark.functions import similarity as sim
from cosmoz_data_pipeline_spark.plans import REGISTRY, catalog_ext, release_persists

DIM = 8
BANDS = 3
PLANES = 5


@pytest.fixture()
def srp_kernel():
    shipped = sim.SRP_KERNEL

    def _set(on: bool | None):
        sim.SRP_KERNEL = on

    yield _set
    sim.SRP_KERNEL = shipped


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _both_variants(spark, srp_kernel, vec_df, quantized):
    srp_kernel(False)
    fold = _rows(
        sim.srp_band_buckets(vec_df, spark, BANDS, PLANES, DIM, quantized=quantized)
    )
    srp_kernel(True)
    kern = _rows(
        sim.srp_band_buckets(vec_df, spark, BANDS, PLANES, DIM, quantized=quantized)
    )
    return fold, kern


def test_kernel_matches_fold_quantized_edges(spark, srp_kernel):
    # adversarial quantized inputs: zero vector (every projection == 0,
    # strict > keeps the bit off), null elements (idot coalesces to 0),
    # whole-null and empty vectors (bucket 0), short vector (zip_with
    # null-pads), LONG vector (elements past dim pair with null weights
    # and drop), alternating signs, and components big enough
    # (|q| ~ 2e9 < 2^31) that the float64 matmul would round — forcing
    # the kernel's exact int64 fallback
    rows = [
        (0, [0] * DIM),
        (1, [1, -1, 2, -2, 3, -3, 4, -4]),
        (2, [None, 5, None, -5, 6, None, -6, 7]),
        (3, None),
        (4, []),
        (5, [9, -9, 8]),
        (6, [1, 2, 3, 4, 5, 6, 7, 8, 999, -999, 12345]),
        (7, [430_000, -430_000, 430_000, -430_000, 1, -1, 0, 430_000]),
        (8, [2_000_000_000, -2_000_000_000] * 4),
        (9, [2_000_000_000, 1, -2_000_000_000, 1, 2_000_000_000, -1, 1, -1]),
    ]
    vec_df = spark.createDataFrame(rows, "vec_id long, v array<int>")
    fold, kern = _both_variants(spark, srp_kernel, vec_df, quantized=True)
    assert kern == fold
    assert len(kern) == len(rows) * BANDS


def test_kernel_matches_fold_raw_doubles(spark, srp_kernel):
    # unquantized path: the kernel applies the identical floor(v*1e6)
    # IEEE grid, with null elements skipped and whole-null vectors
    # folding to bucket 0
    rows = [
        (0, [0.31, -0.29, 0.005, -0.005, 0.127, -0.127, 0.43, -0.43]),
        (1, [1e-7, -1e-7, 0.0, -0.0, 0.9999999, -0.9999999, 0.5, -0.5]),
        (2, [None, 0.25, None, -0.25, 0.125, None, -0.125, 0.0625]),
        (3, None),
        (4, []),
        # |v| up to 2000 stays inside the int32 grid bound (~2147.48)
        # but puts |q| ~ 2e9 past the float64 envelope -> int64 path
        (5, [2000.0, -2000.0, 1999.5, -1999.5, 0.1, -0.1, 2000.0, -2000.0]),
    ]
    vec_df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    fold, kern = _both_variants(spark, srp_kernel, vec_df, quantized=False)
    assert kern == fold


def test_kernel_raises_past_grid_bound_like_quantize(spark, srp_kernel):
    # quantize() raises rather than letting the ANSI-off int cast wrap
    # (ADVICE r7); the kernel must refuse the same inputs
    vec_df = spark.createDataFrame(
        [(0, [3000.0] * DIM)], "vec_id long, v array<double>"
    )
    srp_kernel(True)
    with pytest.raises(Exception, match="int32 grid bound"):
        sim.srp_band_buckets(
            vec_df, spark, BANDS, PLANES, DIM, quantized=False
        ).collect()


@pytest.mark.parametrize("name", ["x_embed_cosine_neardup", "x_ann_lsh_buckets"])
def test_query_output_identical_with_kernel(spark, sf_dir, srp_kernel, name):
    def run():
        rows = _rows(REGISTRY[name].run(spark, sf_dir))
        release_persists()
        return rows

    srp_kernel(False)
    base = run()
    assert base, "corpus must produce rows for this test to bite"
    srp_kernel(True)
    assert run() == base


def test_auto_gate_reads_corpus_count_not_session_state(spark, srp_kernel):
    # under None = auto, the gate basis is the caller-memoized
    # per-corpus row count — the round-10 prescreen bug (session-conf
    # proxy) is the precedent. n >= SRP_KERNEL_MIN_N plans the
    # mapInPandas kernel, below keeps the in-JVM fold, n=None (count
    # unknown) keeps the fold. (The shipped default is True —
    # unconditional, SRP_KERNEL_AB.json.)
    srp_kernel(None)
    vec_df = spark.createDataFrame(
        [(0, [1] * DIM)], "vec_id long, v array<int>"
    )
    plan_small = sim.srp_band_buckets(
        vec_df, spark, BANDS, PLANES, DIM, quantized=True,
        n=sim.SRP_KERNEL_MIN_N - 1,
    )._jdf.queryExecution().executedPlan().toString()
    plan_big = sim.srp_band_buckets(
        vec_df, spark, BANDS, PLANES, DIM, quantized=True,
        n=sim.SRP_KERNEL_MIN_N,
    )._jdf.queryExecution().executedPlan().toString()
    plan_none = sim.srp_band_buckets(
        vec_df, spark, BANDS, PLANES, DIM, quantized=True,
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_small
    assert "MapInPandas" in plan_big
    assert "MapInPandas" not in plan_none


def test_bank_broadcast_memo_evicts_dead_applications(spark):
    # round 12 (ADVICE r11): the plane-bank broadcast memo is keyed by
    # applicationId and must evict-and-DESTROY entries from dead
    # applications on insert, or a long-lived process that rebuilds
    # sessions accumulates Broadcast state forever
    destroyed = []

    class FakeBc:
        def destroy(self):
            destroyed.append(True)

    stale_key = ("dead-app-id", 8, 4, 16)
    sim._SRP_BANK_BC[stale_key] = FakeBc()
    # the sweep runs on insert: drop the live app's entry (if an
    # earlier test built it) so this call takes the build branch
    live_key = (spark.sparkContext.applicationId, 8, 4, 16)
    sim._SRP_BANK_BC.pop(live_key, None)
    df = spark.createDataFrame(
        [(1, [0.1] * 16)], "vec_id int, v array<double>"
    )
    try:
        sim.srp_band_buckets_kernel(df, 8, 4, 16).collect()
        assert stale_key not in sim._SRP_BANK_BC
        assert destroyed == [True]
        live = [k for k in sim._SRP_BANK_BC if k[1:] == (8, 4, 16)]
        assert live and live[0][0] == spark.sparkContext.applicationId
    finally:
        sim._SRP_BANK_BC.pop(stale_key, None)
