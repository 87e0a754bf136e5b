"""Interleaved A/B for the bucketed SINGLE-direction as-of join
(operators/asof.ASOF_SINGLE_BUCKETED inside ``asof_join``): times the
registry's j05 (backward) event as-of join — plus the same probe set
under direction='forward' (the registry's j06 probes on
event_type='signup', which the scale corpus does not generate — 0
rows, vacuous to time) — with the plain per-key running-last window against the (key, week-bucket) +
tail-carry shape in ONE session, alternating variants per repeat so
host drift cancels.

Why this needs its own artifact: LEVEL_ASOF_AB.json adjudicated the
bucketed shape on the level2 UNION as-of (``asof_join_both``), whose
key is site_no — 8 values, the low-cardinality regime the bucketed
windows were built for (a per-key sort no partition count can
split). The single-direction ``asof_join`` the engine actually ships
is called on user_id — 2000 keys in the scale corpus, 60x the core
count — where partitionBy(key) is already balanced across reducers
and the bucketed shape's extra groupBy + carry join is pure
overhead. Sharing the corpus-size auto-gate was therefore a
HYPOTHESIS, not an inference from the union-path win; this tool
adjudicated it at the decades. VERDICT: the bucketed shape LOSES at
every decade in both directions (plain/bucketed ratios 0.65-0.73),
so asof.ASOF_SINGLE_BUCKETED defaults to False (plain window at
every corpus size); the hook + identity tests stay for genuinely
low-cardinality asof_join deployments. Row identity across variants is pinned by
tests/test_bucketed_window.py (both directions x strictness); the
run guard here is row count.

Outputs are forced with a noop write (full materialization — both
variants produce the same projection, so noop compares exactly the
work they differ on).

Usage: python tools/asof_single_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000.
Writes ASOF_SINGLE_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.operators import asof  # noqa: E402
from cosmoz_data_pipeline_spark.operators.asof import asof_join  # noqa: E402
from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans.registry import release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from cosmoz_data_pipeline_spark.sources.tables import load_table  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

VARIANTS = (("plain", False), ("bucketed", True))


def _forward_workload(spark, sf_dir: str):
    """The registry's j06 probes on event_type='signup', which the
    scale corpus does not generate (0 probe rows — vacuous to time).
    Same operator, same code path, real volume: earliest purchase
    at-or-after each view/click — j05's probe set with
    direction='forward'."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.where(F.col("event_type").isin("view", "click"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        probes,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        values=["value"],
        direction="forward",
        suffix="_next_purchase",
    )
    return out.select("event_id", "user_id", "value_next_purchase")


QUERIES = ("j05_asof_backward_join", "forward_view_click")


def _one(spark, sf_dir: str, query: str, bucketed: bool, count_rows: bool):
    asof.ASOF_SINGLE_BUCKETED = bucketed
    _cold(spark)
    if query == "forward_view_click":
        df = _forward_workload(spark, sf_dir)
    else:
        df = REGISTRY[query].run(spark, sf_dir)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # metrics BEFORE the untimed count (a second full execution)
    met = _metrics_since(spark, hwm)
    rows = df.count() if count_rows else None
    release_persists()
    _cold(spark)
    return dt, rows, met


def main() -> None:
    args = sys.argv[1:]
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = asof.ASOF_SINGLE_BUCKETED
    spark = build_session(
        app_name="asof-single-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "asof_single_ab",
        "unit": "sec",
        "repeats": repeats,
        "queries": list(QUERIES),
        "shipped_variant": "auto (None = corpus-gated)"
        if shipped is None
        else ("bucketed" if shipped else "plain"),
        "corpora": {},
    }
    try:
        for d, mult in corpora:
            for query in QUERIES:
                rec = {key: {"t": []} for key, _ in VARIANTS}
                rows_seen = set()
                for rep in range(repeats):
                    for key, bucketed in VARIANTS:
                        dt, rows, met = _one(spark, d, query, bucketed, rep == 0)
                        rec[key]["t"].append(round(dt, 3))
                        if rows is not None:
                            rows_seen.add(rows)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"x{mult:<5d} {query:24s} {key:9s} {dt:8.2f}s rows={rows}",
                            flush=True,
                        )
                if len(rows_seen) != 1:  # raise, not assert: asserts
                    # vanish under python -O and this is the
                    # measurement path's only equivalence guard (full
                    # row identity is pinned by
                    # tests/test_bucketed_window.py)
                    raise RuntimeError(
                        f"variants disagree on row count: {rows_seen}"
                    )
                rec["rows"] = rows_seen.pop()
                for key, _ in VARIANTS:
                    rec[key]["best"] = min(rec[key]["t"])
                rec["speedup_plain_over_bucketed"] = round(
                    rec["plain"]["best"] / rec["bucketed"]["best"], 3
                )
                out["corpora"][f"x{mult}:{query}"] = rec
    finally:
        asof.ASOF_SINGLE_BUCKETED = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ASOF_SINGLE_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
