"""Tolerance-aware table diff (SURVEY §2.7 T1) — the reference's only
correctness machinery, generalized.

The reference zips two series row-by-row in the driver and compares
each float field within per-level abs/rel thresholds
(/root/reference/pipeline/cosmoz_process_levels.py:456-620: exact for
level1, rel 8.9e-07 % for level2, abs 1e-5 ∨ rel 3.3e-4 % for level3,
abs 3.29e-5 ∨ rel 4.8e-6 % for level4). Here it is a distributed
keyed full-outer join + tolerance predicates: scales to any table
size, reports missing/extra keys as well as value drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tolerance_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    pairs: Sequence[tuple[str, str]],
    abs_tol: float = 0.0,
    rel_tol: float = 0.0,
) -> DataFrame:
    """Rows whose paired float columns disagree beyond BOTH tolerances
    (abs OR rel passes ⇒ the pair matches, mirroring the reference's
    ``fabs(a-b) <= abs ∨ fabs(a-b) <= rel·|b|`` tests).

    Output: key columns + ``abs_diff_<left_col>`` per pair, one row per
    key with at least one out-of-tolerance pair. Keys present on only
    one side surface as NULL-vs-value rows (the reference's zip simply
    truncated — a silent-coverage bug this form fixes).
    """
    joined = left.join(right, list(keys), "full_outer")
    mismatch = F.lit(False)
    cols = [*keys]
    for lc, rc in pairs:
        diff = F.abs(F.col(lc) - F.col(rc))
        ok = (diff <= F.lit(abs_tol)) | (diff <= F.lit(rel_tol) * F.abs(F.col(rc)))
        mismatch = mismatch | ~F.coalesce(ok, F.lit(False))
        cols.append(diff.alias(f"abs_diff_{lc}"))
    return joined.where(mismatch).select(*cols)
