"""Dev harness mimicking the driver's correctness gate: run a Spark
query and its DuckDB oracle side by side, compare row-count, schema
(by sorted column names) and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
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
