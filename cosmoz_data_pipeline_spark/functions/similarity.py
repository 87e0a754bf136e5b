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


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def srp_hyperplane_component(dim_idx: Column, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane weight for sign-random-
    projection LSH: pure integer LCG arithmetic (exact in any engine),
    centered to ±1e6."""
    raw = (
        F.lit(1103515245) * (dim_idx + 1).cast("bigint")
        + F.lit(12345) * (plane_idx + 1)
    ) % F.lit(2000001)
    return (raw - F.lit(1000000)).cast("double")


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
