"""Query registry: every implemented operator from SURVEY §2 gets a
named (spark_fn, oracle_sql) pair consumed by __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

RunFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    run: RunFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[RunFn], RunFn]:
    def deco(fn: RunFn) -> RunFn:
        REGISTRY[name] = Query(name=name, run=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
