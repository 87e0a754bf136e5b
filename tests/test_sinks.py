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
