"""Dev harness mimicking the driver's correctness gate: run a Spark
query and its DuckDB oracle side by side, compare row-count, schema
(by sorted column names) and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Views over every table present in ``sf_dir``. Tables whose
    parquet is absent are skipped (scale corpora from
    tools/scale_corpus.py carry only events/documents/embeddings/
    nation — queries over missing tables then fail loudly at oracle
    time, not at connection time)."""
    import os

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset directory
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            # Width-normalize WITHIN a kind (int32 == int64): the
            # driver's canonical form equates widths but not kinds, so
            # int-vs-float divergence must survive canonicalization to
            # be caught by the dtype gate in compare().
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_sql: str, con) -> tuple[bool, str]:
    s = _canon(spark_df.toPandas())
    d = _canon(con.execute(oracle_sql).df())
    if s.shape != d.shape:
        return False, f"shape {s.shape} vs {d.shape}"
    if list(s.columns) != list(d.columns):
        return False, f"columns {list(s.columns)} vs {list(d.columns)}"
    for c in s.columns:
        a, b = s[c], d[c]
        # Driver-faithful dtype gate: the driver hashes canonicalized
        # values, so an int64 Spark column against a float64 oracle
        # column (e.g. DuckDB promoting integer sum() to HUGEINT, which
        # pandas materializes as float64) hashes 15 vs 15.0 and FAILS
        # even when every value is numerically equal. Mirror that here:
        # numeric kind divergence (int vs float) is an error, not a
        # tolerated coercion. Width differences within a kind (int32 vs
        # int64) are fine — the driver's canonical form equates those.
        if a.dtype.kind != b.dtype.kind:
            return False, (
                f"dtype kind mismatch col {c}: spark {a.dtype} vs oracle {b.dtype} "
                f"(driver hash would differ even on equal values — "
                f"CAST the oracle output column, e.g. HUGEINT sum() -> BIGINT)"
            )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = ((a.isna() & b.isna()) | (a == b)).all()
            if not ok:
                bad = (~((a.isna() & b.isna()) | (a == b))).idxmax()
                return False, (
                    f"float col {c} differs at row {bad}: {a[bad]!r} vs {b[bad]!r} "
                    f"(delta={abs(a[bad]-b[bad]) if not (math.isnan(a[bad]) or math.isnan(b[bad])) else 'nan'})"
                )
        else:
            if not a.equals(b):
                bad = (a != b).idxmax()
                return False, f"col {c} differs at row {bad}: {a[bad]!r} vs {b[bad]!r}"
    return True, f"OK rows={len(s)}"
