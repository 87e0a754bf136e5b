"""Unit tests for the batched-sink retry policy (S8-S10/ST9)."""

from __future__ import annotations

import os

import pytest

from cosmoz_data_pipeline_spark.streaming.sinks import RetryingBatchSink, write_report


class Flaky:
    """write_fn failing the first ``fail_n`` calls, then succeeding."""

    def __init__(self, fail_n: int, exc: Exception | None = None):
        self.fail_n = fail_n
        self.calls = 0
        self.exc = exc or TimeoutError("server timeout")

    def __call__(self, batch_df, batch_id):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise self.exc


def test_retry_once_then_succeed():
    slept = []
    fn = Flaky(fail_n=1)
    sink = RetryingBatchSink(fn, retries=1, backoff_s=5.0, sleep=slept.append)
    sink(None, 0)
    assert fn.calls == 2
    assert slept == [5.0]


def test_retries_exhausted_propagates():
    slept = []
    fn = Flaky(fail_n=2)
    sink = RetryingBatchSink(fn, retries=1, backoff_s=5.0, sleep=slept.append)
    with pytest.raises(TimeoutError):
        sink(None, 0)
    assert fn.calls == 2  # initial + one retry, reference policy
    assert slept == [5.0]


def test_non_retryable_propagates_immediately():
    slept = []
    fn = Flaky(fail_n=1, exc=ValueError("bad schema"))
    sink = RetryingBatchSink(
        fn,
        retries=3,
        retryable=lambda e: isinstance(e, TimeoutError),
        sleep=slept.append,
    )
    with pytest.raises(ValueError):
        sink(None, 0)
    assert fn.calls == 1
    assert slept == []


def test_write_report_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "k")
    path = os.path.join(str(tmp_path), "report")
    write_report(df, path, fmt="json")
    back = spark.read.json(path)
    assert back.count() == 10
    with pytest.raises(ValueError):
        write_report(df, path, fmt="xml")


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "site_no int, ts string, value double")


def test_duckdb_upsert_is_idempotent(spark, tmp_path):
    import duckdb

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    db = os.path.join(str(tmp_path), "store.duckdb")
    sink = DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"])
    b0 = _mk_batch(spark, [(1, "t1", 10.0), (1, "t2", 11.0), (2, "t1", 20.0)])
    sink(b0, 0)
    sink(b0, 0)  # replayed batch (streaming redelivery) must not duplicate
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 3
    # an upsert with a changed value for an existing key overwrites it
    sink(_mk_batch(spark, [(1, "t2", 99.0)]), 1)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 3
    assert (
        con.sql("SELECT value FROM points WHERE site_no=1 AND ts='t2'").fetchone()[0]
        == 99.0
    )
    con.close()


def test_duckdb_upsert_chunked_bounded_memory(spark, tmp_path):
    """Sink memory is bounded by chunk_rows, not the micro-batch: a
    50-row batch through a 7-row chunk flushes ceil(50/7) chunks, none
    larger than 7 rows, inside one transaction (count and upsert
    semantics unchanged). An empty batch still creates the table."""
    import duckdb

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    db = os.path.join(str(tmp_path), "store.duckdb")
    sink = DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"], chunk_rows=7)
    rows = [(i % 5, f"t{i}", float(i)) for i in range(50)]
    sink(_mk_batch(spark, rows), 0)
    assert sink.chunks_flushed == 8  # ceil(50 / 7)
    assert sink.max_chunk_rows_seen <= 7
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 50
    con.close()
    # replay converges (chunked delete+insert stays idempotent)
    sink(_mk_batch(spark, rows), 0)
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 50
    con.close()
    # empty batch: no chunks, but the table exists
    db2 = os.path.join(str(tmp_path), "empty.duckdb")
    sink2 = DuckDBUpsertSink(db2, "points", key_cols=["site_no", "ts"], chunk_rows=7)
    sink2(_mk_batch(spark, []).limit(0), 0)
    con = duckdb.connect(db2)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 0
    con.close()
    assert sink2.chunks_flushed == 0


def test_duckdb_upsert_retries_timeout_then_succeeds(spark, tmp_path):
    """The reference policy end-to-end: injected server timeout on the
    first flush attempt -> one backoff -> successful write
    (influx_cached_writer.py:20-38)."""
    import duckdb

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    db = os.path.join(str(tmp_path), "store.duckdb")
    boom = Flaky(fail_n=1)
    sink = DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"], pre_write=boom)
    slept = []
    retrying = RetryingBatchSink(
        sink,
        retries=1,
        backoff_s=5.0,
        retryable=lambda e: isinstance(e, TimeoutError),
        sleep=slept.append,
    )
    retrying(_mk_batch(spark, [(1, "t1", 10.0), (2, "t1", 20.0)]), 0)
    assert boom.calls == 2 and slept == [5.0]
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 2
    con.close()


def test_duckdb_sink_from_structured_stream(spark, tmp_path):
    """Full S9 path: readStream -> foreachBatch(RetryingBatchSink(
    DuckDBUpsertSink)) with AvailableNow, rows land in the store."""
    import duckdb

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    src = os.path.join(str(tmp_path), "src")
    db = os.path.join(str(tmp_path), "store.duckdb")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    spark.createDataFrame(
        [(i, f"t{i}", float(i)) for i in range(50)], "site_no int, ts string, value double"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sink = RetryingBatchSink(
        DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"]), retries=1,
        sleep=lambda _s: None,
    )
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 50
    con.close()


def test_duckdb_upsert_no_python_row_objects(spark, tmp_path, monkeypatch):
    """Round 6 (VERDICT r5 task 2): the hand-off is Arrow end-to-end —
    no driver-side per-row Python conversion. Spy: poison
    Row.asDict; the sink must never touch it (the r5 loop called it
    once per data row)."""
    import duckdb
    from pyspark.sql import Row

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    def _boom(self, recursive=False):
        raise AssertionError("per-row Python conversion in the sink path")

    monkeypatch.setattr(Row, "asDict", _boom)
    db = os.path.join(str(tmp_path), "store.duckdb")
    sink = DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"], chunk_rows=7)
    rows = [(i % 5, f"t{i}", float(i)) for i in range(50)]
    sink(_mk_batch(spark, rows), 0)
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == 50
    con.close()


def test_duckdb_upsert_arrow_throughput_vs_row_loop(spark, tmp_path):
    """Measured throughput of the Arrow IPC hand-off vs the r5
    row-at-a-time loop (re-implemented inline), same 300k-row batch,
    same chunking and transaction shape. Numbers go to the test log
    (-s); the assert only guards a catastrophic regression — the
    sub-second absolute scale makes tight ratios flaky."""
    import time as _time

    import duckdb
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from cosmoz_data_pipeline_spark.streaming.sinks import DuckDBUpsertSink

    n, chunk = 1_000_000, 100_000
    batch = spark.range(n).selectExpr(
        "CAST(id % 97 AS INT) AS site_no",
        "CAST(id AS STRING) AS ts",
        "CAST(id AS DOUBLE) AS value",
    )

    def legacy_row_loop(db_path: str) -> None:
        arrow_schema = to_arrow_schema(batch.schema)
        cols = ", ".join(f'"{f.name}"' for f in batch.schema.fields)
        match = " AND ".join(f'b."{k}" = "points"."{k}"' for k in ("site_no", "ts"))
        con = duckdb.connect(db_path)
        con.execute("BEGIN TRANSACTION")
        con.register("chunk_rows", arrow_schema.empty_table())
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "points" AS SELECT {cols} FROM chunk_rows LIMIT 0'
        )

        def flush(rows):
            tbl = pa.Table.from_pylist(rows, schema=arrow_schema)
            con.register("chunk_rows", tbl)
            con.execute(
                f'DELETE FROM "points" WHERE EXISTS (SELECT 1 FROM chunk_rows b WHERE {match})'
            )
            con.execute(f'INSERT INTO "points" SELECT {cols} FROM chunk_rows')

        buf = []
        for row in batch.toLocalIterator(prefetchPartitions=False):
            buf.append(row.asDict(recursive=True))
            if len(buf) >= chunk:
                flush(buf)
                buf = []
        if buf:
            flush(buf)
        con.execute("COMMIT")
        con.close()

    # warm both paths' fixed costs (Python workers, codegen) once
    DuckDBUpsertSink(
        os.path.join(str(tmp_path), "warm.duckdb"), "points",
        key_cols=["site_no", "ts"], chunk_rows=chunk,
    )(batch.limit(1000), 0)

    t0 = _time.time()
    legacy_row_loop(os.path.join(str(tmp_path), "legacy.duckdb"))
    t_legacy = _time.time() - t0

    db = os.path.join(str(tmp_path), "arrow.duckdb")
    sink = DuckDBUpsertSink(db, "points", key_cols=["site_no", "ts"], chunk_rows=chunk)
    t0 = _time.time()
    sink(batch, 0)
    t_arrow = _time.time() - t0

    print(
        f"\nDuckDBUpsertSink hand-off, {n} rows, chunk={chunk}: "
        f"arrow={t_arrow:.2f}s ({n / t_arrow:,.0f} rows/s)  "
        f"legacy row loop={t_legacy:.2f}s ({n / t_legacy:,.0f} rows/s)"
    )
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM points").fetchone()[0] == n
    con.close()
    assert t_arrow < t_legacy * 2, (t_arrow, t_legacy)
