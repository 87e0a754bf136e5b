"""Vector-similarity column builders (ANN extension operators).

Dot products / norms are explicit left-to-right folds over
array<double> so Spark and the DuckDB oracle accumulate in the same
order (double addition is not associative). Embeddings are cast
float→double at the edge (exact) before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right ``zip_with``/``aggregate`` fold — THE kernel for
    every data-scaled path. Round-5 finding that reversed the round-3
    choice: the 64-term unrolled ``getItem`` expression is faster only
    while the whole fused stage stays inside whole-stage codegen; on
    the big scoring joins (142 M candidate rows at the x1000 corpus)
    the stage blows Spark's generated-method limits, falls back to
    interpreted expression eval, and the 64 GetArrayItem nodes box one
    Double each per row — measured 433 s vs 43 s for this fold on the
    identical join. The fold is one ArrayAggregate node looping over
    the array data, so its cost is stable whether or not the stage
    compiles. Accumulation order ``((0.0+t1)+t2)+...`` matches the
    unrolled form and the oracle's list_aggregate, bit for bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a ``zip_with``/``aggregate`` fold (see
    :func:`dot` for why the fold beats an unrolled expression on big
    stages). Intended for INTEGER (quantized) arrays: every term and
    the sum are exact in int64, so the result is independent of
    evaluation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Fixed-dimension dot product as an explicit left-associative sum
    of ``getItem`` terms. Faster than :func:`dot` ONLY while the fused
    stage stays within whole-stage-codegen method limits — true for
    small plans, false for the large scoring joins (see :func:`dot`),
    which is why no data-scaled path uses it. Kept for narrow
    fixed-size expressions (e.g. K-row centroid jobs) where the stage
    is tiny and compiles. Accumulation order is identical to the
    fold's, so results are bit-for-bit equal to :func:`dot`."""
    out = F.lit(0.0)
    for i in range(dim):
        out = out + a.getItem(i) * b.getItem(i)
    return out


def l2sq_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Fixed-dimension squared L2 distance as an explicit sum of
    ``getItem`` terms — same small-stage-only caveat as
    :func:`dot_unrolled`; data-scaled paths use :func:`l2sq`. Intended
    for INTEGER (quantized) arrays: every term and the sum are exact
    in int64, so the result is independent of evaluation order."""
    out = None
    for i in range(dim):
        d = a.getItem(i) - b.getItem(i)
        out = d * d if out is None else out + d * d
    return out


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_unrolled(a: Column, dim: int) -> Column:
    return F.sqrt(dot_unrolled(a, a, dim))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def cosine_unrolled(
    a: Column, b: Column, norm_a: Column, norm_b: Column, dim: int
) -> Column:
    return dot_unrolled(a, b, dim) / (norm_a * norm_b)


# --------------------------------------------------- SRP (sign random
# projection) LSH. Hyperplane weights are md5-derived integers — an
# earlier LCG scheme (w = (a*i + b*p) mod m) made every plane a small
# additive shift of the same hyperplane, so all 64 "independent" planes
# voted identically and buckets collapsed (measured: 80% of all pairs
# became candidates). Projections run on floor(v*1e6)-quantized vectors
# with integer weights: every partial sum stays < 2^53, so the result
# is EXACT in int64 and float64 and independent of accumulation order —
# parity with any oracle engine needs no ordered-fold gymnastics.

SRP_MOD = 2000001
SRP_HALF = 1000000
SRP_QUANT = 1_000_000  # vector components → floor(v * 1e6)
SRP_MAX_PLANES = 30  # bucket ids must stay well inside int64


def srp_planes_for(n: int, target_bucket: int = 8) -> int:
    """Planes per band scaled to the corpus: the smallest r with
    2^r >= ceil(n / target_bucket) (expected bucket occupancy stays
    ~target_bucket however large n grows — a FIXED plane count makes
    buckets, and the within-bucket candidate join, grow linearly with
    the corpus), clamped to [8, 30]. Pure integer arithmetic
    (bit_length ≡ LENGTH(bin(x)) in DuckDB) so both engines derive the
    identical r from the same count."""
    m = (n + target_bucket - 1) // target_bucket
    r = (m - 1).bit_length() if m > 1 else 0
    return min(SRP_MAX_PLANES, max(8, r))


def srp_sql_cfg(src: str, target_bucket: int = 8) -> str:
    """``cfg`` CTE: the DuckDB mirror of :func:`srp_planes_for` over
    ``src``'s row count."""
    t1 = target_bucket - 1
    return f"""cfg AS (
    SELECT LEAST({SRP_MAX_PLANES}, GREATEST(8,
        CASE WHEN (COUNT(*) + {t1}) // {target_bucket} <= 1 THEN 0
             ELSE LENGTH(bin((COUNT(*) + {t1}) // {target_bucket} - 1)) END)) AS r
    FROM {src})"""


def srp_weight(plane: int, dim_i: int) -> int:
    """Deterministic md5-derived hyperplane weight in [-1e6, 1e6]:
    first 32 bits of md5('srp{plane}_{dim_i}'), centered. dim_i is
    1-based to match SQL array indexing."""
    import hashlib

    h = int(hashlib.md5(f"srp{plane}_{dim_i}".encode()).hexdigest()[:8], 16)
    return h % SRP_MOD - SRP_HALF


def srp_weights_df(spark, bands: int, planes_per_band: int, dim: int):
    """Tiny broadcastable weight table: one row per (plane, dimension).
    ``bitval`` is precomputed (1 << bit-within-band) so the bucket
    assembly is a plain conditional SUM — no variable-shift expression.
    """
    rows = [
        (p, p // planes_per_band, 1 << (p % planes_per_band), i, srp_weight(p, i))
        for p in range(bands * planes_per_band)
        for i in range(1, dim + 1)
    ]
    return spark.createDataFrame(
        rows, "plane int, band int, bitval long, i int, w long"
    )


def srp_band_buckets(
    vec_df, spark, bands: int, planes_per_band: int, dim: int,
    id_col: str = "vec_id", vec_col: str = "v",
):
    """(id, band, bucket) SRP assignments: posexplode the vector, join
    the broadcast weight table on dimension, partial-agg the integer
    projections per plane, then assemble each band's bucket as a
    conditional bit sum. Two shuffles, both keyed on the id — the
    relational shape that survives 100 TB (vs unrolling bands×planes×dim
    literal terms into one projection, which breaks codegen limits)."""
    qv = vec_df.select(id_col, F.posexplode(vec_col).alias("i0", "x")).select(
        id_col,
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x") * SRP_QUANT).cast("bigint").alias("q"),
    )
    wdf = F.broadcast(srp_weights_df(spark, bands, planes_per_band, dim))
    proj = (
        qv.join(wdf, "i")
        .groupBy(id_col, "plane", "band", "bitval")
        .agg(F.sum(F.col("q") * F.col("w")).alias("s"))
    )
    return (
        proj.select(
            id_col, "band",
            F.when(F.col("s") > 0, F.col("bitval")).otherwise(F.lit(0)).alias("bit"),
        )
        .groupBy(id_col, "band")
        .agg(F.sum("bit").alias("bucket"))
    )


def srp_sql_ctes(src: str, bands: int, planes_per_band: int, dim: int = 64) -> str:
    """DuckDB mirror of :func:`srp_band_buckets` as CTE text: ``wt``
    recomputes the identical md5 weights in SQL; integer projections
    make the parity exact regardless of DuckDB's aggregation order.
    ``src`` must expose (vec_id, v DOUBLE[])."""
    total = bands * planes_per_band
    return f"""wt AS (
    SELECT p, i,
           ('0x' || substr(md5('srp' || CAST(p AS VARCHAR) || '_'
                                || CAST(i AS VARCHAR)), 1, 8))::BIGINT
             % {SRP_MOD} - {SRP_HALF} AS w
    FROM generate_series(0, {total - 1}) t(p), generate_series(1, {dim}) s(i)),
qv AS (
    SELECT vec_id, i, CAST(floor(v[i] * {SRP_QUANT}) AS BIGINT) AS q
    FROM {src}, generate_series(1, {dim}) s(i)),
proj AS (
    SELECT qv.vec_id, wt.p, sum(qv.q * wt.w) AS s
    FROM qv JOIN wt USING (i) GROUP BY 1, 2),
bk AS (
    SELECT vec_id, p // {planes_per_band} AS band,
           CAST(sum(CASE WHEN s > 0 THEN 1 << (p % {planes_per_band}) ELSE 0 END)
                AS BIGINT) AS bucket
    FROM proj GROUP BY 1, 2)"""


def srp_sql_ctes_dynamic(src: str, bands: int, dim: int = 64) -> str:
    """Like :func:`srp_sql_ctes` but planes-per-band comes from the
    ``cfg`` CTE (:func:`srp_sql_cfg` must precede) so banding scales
    with the corpus. generate_series needs constant bounds in DuckDB,
    so the plane series is generated at the clamp maximum and filtered
    by cfg.r."""
    maxp = bands * SRP_MAX_PLANES
    return f"""wt AS (
    SELECT p, i,
           ('0x' || substr(md5('srp' || CAST(p AS VARCHAR) || '_'
                                || CAST(i AS VARCHAR)), 1, 8))::BIGINT
             % {SRP_MOD} - {SRP_HALF} AS w
    FROM generate_series(0, {maxp - 1}) t(p), generate_series(1, {dim}) s(i), cfg
    WHERE p < {bands} * cfg.r),
qv AS (
    SELECT vec_id, i, CAST(floor(v[i] * {SRP_QUANT}) AS BIGINT) AS q
    FROM {src}, generate_series(1, {dim}) s(i)),
proj AS (
    SELECT qv.vec_id, wt.p, sum(qv.q * wt.w) AS s
    FROM qv JOIN wt USING (i) GROUP BY 1, 2),
bk AS (
    SELECT vec_id, p // cfg.r AS band,
           CAST(sum(CASE WHEN s > 0 THEN 1 << (p % cfg.r) ELSE 0 END)
                AS BIGINT) AS bucket
    FROM proj, cfg GROUP BY 1, 2)"""
