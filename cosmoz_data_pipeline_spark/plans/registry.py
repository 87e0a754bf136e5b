"""Query registry: every implemented operator from SURVEY §2 gets a
named (spark_fn, oracle_sql) pair consumed by __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

RunFn = Callable[[SparkSession, str], DataFrame]

# ------------------------------------------------------------------
# Scoped persists. Query builders persist intermediates that feed
# several branches of one returned plan; the terminal action (collect/
# write) happens later, in the CALLER, so the builder itself can never
# unpersist without losing the sharing it persisted for. Builders
# therefore route every persist through scoped_persist(), and callers
# free the blocks with release_persists() once the returned DataFrame
# has been consumed (check_all/bench do this per query). Unpersisting
# is always correctness-neutral in Spark — a released intermediate
# just recomputes if the plan is re-executed — so a caller that
# forgets only loses cache residency, bounded by ONE query's working
# set instead of growing for the life of the session.

_LIVE_PERSISTS: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + track for a later release_persists()."""
    df = df.persist()
    _LIVE_PERSISTS.append(df)
    return df


def release_persists() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_LIVE_PERSISTS)
    while _LIVE_PERSISTS:
        _LIVE_PERSISTS.pop().unpersist(blocking=False)
    return n


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
