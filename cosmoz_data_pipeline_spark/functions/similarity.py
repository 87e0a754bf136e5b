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
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Fixed-dimension dot product as an explicit left-associative sum
    of ``getItem`` terms. Higher-order-function folds (``aggregate``/
    ``zip_with``) evaluate INTERPRETED per element; this unrolled form
    stays inside whole-stage codegen (~10× faster on the ANN scoring
    join). The accumulation order ``((0.0+t1)+t2)+...`` is identical to
    the fold's, so results are bit-for-bit equal to :func:`dot`.
    """
    out = F.lit(0.0)
    for i in range(dim):
        out = out + a.getItem(i) * b.getItem(i)
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


def srp_hyperplane_component(dim_idx: Column, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane weight for sign-random-
    projection LSH: pure integer LCG arithmetic (exact in any engine),
    centered to ±1e6."""
    raw = (
        F.lit(1103515245) * (dim_idx + 1).cast("bigint")
        + F.lit(12345) * (plane_idx + 1)
    ) % F.lit(2000001)
    return (raw - F.lit(1000000)).cast("double")


def srp_bucket_unrolled(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Codegen form of :func:`srp_bucket` for a known dimension: the
    LCG hyperplane weights are compile-time constants, so each plane's
    projection unrolls to a literal-weighted sum (same left-to-right
    accumulation order as the fold → bit-identical buckets)."""
    out = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        for i in range(dim):
            w = float((1103515245 * (i + 1) + 12345 * (p + 1)) % 2000001 - 1000000)
            proj = proj + vec.getItem(i) * F.lit(w)
        out = out + F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
    return out


def srp_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-random-projection LSH bucket id in [0, 2^n_planes)."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda i: F.element_at(vec, i + 1) * srp_hyperplane_component(i, p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
