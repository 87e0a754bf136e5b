"""Interleaved A/B at scale: the full level1→level4 chain with the
shipped window-shape level1 prefix vs the adopted scan-local prefix
(round 15, VERDICT r14 task 1).

Question: LEVEL1_STAGES.json put level1's two wide sequence exchanges
at 73 s of level4's x1000 cost, and the scan-local shape retired them
(LEVEL1_SCANLOCAL_AB: 1.69×, 13.13 GB → 0.28 MB shuffle;
LEVEL1_ZONERG_AB: 1.62× on top) — but nothing routed level4's prefix
through it. This A/B answers whether the chain inherits the prefix win
once levels 2-4 (which re-shuffle the fact on (site, week) regardless
of prefix) run downstream.

Fairness: BOTH variants read the SAME materialized layout-contracted
sink (the deployment reality — the level pipeline reads raw from the
sink, whose writer already guarantees the layout; identical framing to
LEVEL1_SCANLOCAL_AB). The dimension/temporal side tables (intensity,
silo, stations) come from the corpus prelude for both.

Protocol: per corpus, identity first (count + bit_xor of xxhash64 over
every level4 output column must be equal), then N interleaved repeats
of A = run_pipeline(read(sink)) under the shipped auto gates and
B = run_pipeline_scan_local(sink), each noop-forced cold, with
per-run shuffle/spill byte counters, cpu sentinel normalization and
io-sentinel brackets on >=x1000 (r13 window classifier).

Usage: python tools/level4_scanlocal_ab.py [dir:mult ...]
Writes LEVEL4_SCANLOCAL_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.domain import levels  # noqa: E402
from cosmoz_data_pipeline_spark.domain.synth import load_domain  # noqa: E402
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


def _variant(spark, which: str, sink: str, d: dict):
    if which == "A":
        return levels.run_pipeline(
            spark.read.parquet(sink),
            d["intensity"],
            d["silo_data"],
            d["all_stations"],
        )["level4"]
    return levels.run_pipeline_scan_local(
        spark, sink, d["intensity"], d["silo_data"], d["all_stations"]
    )["level4"]


def _fingerprint(spark, sink: str, which: str, d: dict):
    df = _variant(spark, which, sink, d)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + "))"
        ).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def _timed(spark, sink: str, which: str, d: dict):
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    _variant(spark, which, sink, d).write.format("noop").mode(
        "overwrite"
    ).save()
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
        app_name="level4-scanlocal-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "level4_scanlocal_ab",
        "unit": "sec",
        "policy": f"interleaved A/B, {REPEATS} repeats, noop-forced cold; "
        "A = shipped run_pipeline over the sink read (auto gates: bucketed "
        "(site, week) lag + hash-prefixed dup window + fused level2 at "
        "scale); B = run_pipeline_scan_local (scan-local level1 prefix + "
        "identical levels 2-4, scale gates hinted from sink bytes); both "
        "variants read the SAME materialized layout-contracted sink; "
        "identity pinned per corpus (count + bit_xor(xxhash64(*)) over "
        "level4 output equal)",
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    for dpath, mult, n_files in corpora:
        sink = ensure_sink(spark, dpath, mult, n_files)
        d = load_domain(spark, dpath)
        fa = _fingerprint(spark, sink, "A", d)
        fb = _fingerprint(spark, sink, "B", d)
        print(f"x{mult}: identity A={fa} B={fb} match={fa == fb}", flush=True)
        rec: dict = {
            "n_files": n_files,
            "identity": {"A": fa, "B": fb, "match": fa == fb},
            "runs": [],
        }
        snt = sentinel_sec(spark, repeats=2)
        io_pre = io_sentinel_sec(spark) if mult >= 1000 else None
        for r in range(REPEATS):
            ta, by_a = _timed(spark, sink, "A", d)
            tb, by_b = _timed(spark, sink, "B", d)
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
        "LEVEL4_SCANLOCAL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
