"""Interleaved A/B at scale: scan-local level1 with the round-13
full-scan duplicate-zone read vs the round-14 row-group-pruned
boundary kernel (guide §6 make pruning reach the scan, §2.3 decide
with small rows).

Question: LEVEL1_STAGES.json (r14 capture, healthy window) shows the
scan-local shape's x1000 wall is NOT in the per-file kernel (7.5 of
30.3 s) — it is in the duplicate zone fix's SECOND full-width JVM
decode of the whole sink plus a third slim (site, time, count) stitch
scan. The boundary kernel (operators/scan_local.py,
SCANLOCAL_BOUNDARY_KERNEL) replaces both with one per-file pyarrow
pass that reads ONLY the row groups intersecting each (site, file)'s
head/tail 29-min windows (the sink writer now emits 8 MiB row groups
so pruning has granularity), emitting the exact zone-row set plus the
per-(site, file) head/tail aggregate.

Protocol: per corpus, identity first (count + bit_xor(xxhash64(*))
equal between shapes), then N interleaved repeats of
A = raw_to_level1_scan_local with SCANLOCAL_BOUNDARY_KERNEL=False
(r13 shape) and B = with True (r14 kernel), each noop-forced cold,
with per-run shuffle/spill bytes, cpu sentinel normalization and
io-sentinel brackets on >=x1000. Both read the SAME sink files.

Usage: python tools/level1_zonerg_ab.py [dir:mult ...]
Writes LEVEL1_ZONERG_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.domain import levels  # noqa: E402
from cosmoz_data_pipeline_spark.operators import scan_local as sl  # noqa: E402
from cosmoz_data_pipeline_spark.sentinel import (  # noqa: E402
    SENTINEL_REF_SEC,
    io_sentinel_sec,
    io_window,
    sentinel_sec,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.level1_scanlocal_ab import ensure_sink  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100, 64),
    ("/tmp/cosmoz_scale_x1000", 1000, 256),
)
REPEATS = 3


def _variant(spark, which: str, sink: str):
    sl.SCANLOCAL_BOUNDARY_KERNEL = which == "B"
    try:
        return levels.raw_to_level1_scan_local(spark, sink)
    finally:
        sl.SCANLOCAL_BOUNDARY_KERNEL = None


def _fingerprint(spark, sink: str, which: str):
    df = _variant(spark, which, sink)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + "))"
        ).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def _timed(spark, sink: str, which: str):
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    _variant(spark, which, sink).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    by = _metrics_since(spark, hwm)
    _cold(spark)
    return round(dt, 3), by


def main() -> None:
    args = sys.argv[1:]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1]), 256) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="level1-zonerg-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "level1_zonerg_ab",
        "unit": "sec",
        "policy": f"interleaved A/B, {REPEATS} repeats, noop-forced cold; "
        "A = raw_to_level1_scan_local with SCANLOCAL_BOUNDARY_KERNEL=False "
        "(r13 full-scan zone read + slim stitch scan); B = True (r14 "
        "row-group-pruned boundary kernel); both read the SAME 8 MiB-"
        "row-group sink; identity pinned per corpus "
        "(count + bit_xor(xxhash64(*)) equal)",
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    for d, mult, n_files in corpora:
        sink = ensure_sink(spark, d, mult, n_files)
        fa = _fingerprint(spark, sink, "A")
        fb = _fingerprint(spark, sink, "B")
        print(f"x{mult}: identity A={fa} B={fb} match={fa == fb}", flush=True)
        rec: dict = {
            "n_files": n_files,
            "identity": {"A": fa, "B": fb, "match": fa == fb},
            "runs": [],
        }
        snt = sentinel_sec(spark, repeats=2)
        io_pre = io_sentinel_sec(spark) if mult >= 1000 else None
        for r in range(REPEATS):
            ta, by_a = _timed(spark, sink, "A")
            tb, by_b = _timed(spark, sink, "B")
            rec["runs"].append(
                {"A": {"t": ta, "run_bytes": by_a}, "B": {"t": tb, "run_bytes": by_b}}
            )
            print(f"  repeat {r}: A {ta:.2f}s  B {tb:.2f}s", flush=True)
        rec["sentinel_sec"] = snt
        if io_pre is not None:
            io_post = io_sentinel_sec(spark)
            rec["io_sentinel_pre_sec"] = io_pre
            rec["io_sentinel_post_sec"] = io_post
            rec["io_window"] = io_window(io_pre, io_post)
        best_a = min(r["A"]["t"] for r in rec["runs"])
        best_b = min(r["B"]["t"] for r in rec["runs"])
        rec["best_A"] = best_a
        rec["best_B"] = best_b
        rec["best_A_normalized"] = round(best_a * SENTINEL_REF_SEC / snt, 3)
        rec["best_B_normalized"] = round(best_b * SENTINEL_REF_SEC / snt, 3)
        rec["speedup_A_over_B"] = round(best_a / best_b, 3)
        rec["pairwise_B_wins"] = sum(
            r["B"]["t"] < r["A"]["t"] for r in rec["runs"]
        )
        out["corpora"][f"x{mult}"] = rec
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEVEL1_ZONERG_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
