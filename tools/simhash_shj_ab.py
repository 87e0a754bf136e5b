"""Interleaved A/B: joined vs pre-aggregated band-candidate stage for
x_dedup_simhash_pairs (round 14, VERDICT r13 task 3, carried from
r12).

Question: post-sigkernel (SIMHASH_SIGKERNEL_AB, r13), the band
self-join is the query's largest remaining stage (~100 s stage-probe
capture at x1000, 3.97 GB shuffle, SIMHASH_PAIRS_STAGES.json). The
PRE-AGG variant (catalog_ext.SIMHASH_BAND_SHJ) exchanges
(band_idx, band_val) → packed doc-id lists and expands pairs in-group:
fewer exchanged bytes — the direction SIMHASH_FUSED_AB proved matters
— no second join input, no SMJ sort.

Protocol: per corpus, identity first (count + bit_xor(xxhash64(*)) of
the full query output under both flags), then N interleaved repeats of
the REGISTERED x_dedup_simhash_pairs query end-to-end, noop-forced
cold, per-run byte counters, cpu sentinel + io brackets on >=x1000.

Usage: python tools/simhash_shj_ab.py [dir:mult ...]
Writes SIMHASH_SHJ_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext as CE  # noqa: E402
from cosmoz_data_pipeline_spark.sentinel import (  # noqa: E402
    SENTINEL_REF_SEC,
    io_sentinel_sec,
    io_window,
    sentinel_sec,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)
REPEATS = 3
QUERY = "x_dedup_simhash_pairs"


def _df(spark, sf_dir, shj: bool):
    CE.SIMHASH_BAND_SHJ = shj
    return REGISTRY[QUERY].run(spark, sf_dir)


def _fingerprint(spark, sf_dir, shj: bool):
    df = _df(spark, sf_dir, shj)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
        ).alias("x"),
    ).collect()[0]
    _cold(spark)
    return int(row["n"]), int(row["x"])


def _timed(spark, sf_dir, shj: bool):
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    _df(spark, sf_dir, shj).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    by = _metrics_since(spark, hwm)
    _cold(spark)
    return round(dt, 3), by


def main() -> None:
    args = sys.argv[1:]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="simhash-shj-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    shipped = CE.SIMHASH_BAND_SHJ
    out = {
        "metric": "simhash_shj_ab",
        "unit": "sec",
        "policy": f"interleaved A/B, {REPEATS} repeats, noop-forced cold; "
        "A = planner sort-merge band self-join (shipped), B = forced "
        "shuffled-hash (hint only, same exchange); full registered "
        f"{QUERY} end-to-end; identity pinned per corpus",
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    try:
        for d, mult in corpora:
            fa = _fingerprint(spark, d, False)
            fb = _fingerprint(spark, d, True)
            print(f"x{mult}: identity A={fa} B={fb} match={fa == fb}", flush=True)
            rec: dict = {"identity": {"A": fa, "B": fb, "match": fa == fb}, "runs": []}
            snt = sentinel_sec(spark, repeats=2)
            io_pre = io_sentinel_sec(spark) if mult >= 1000 else None
            for r in range(REPEATS):
                ta, by_a = _timed(spark, d, False)
                tb, by_b = _timed(spark, d, True)
                rec["runs"].append(
                    {
                        "A": {"t": ta, "run_bytes": by_a},
                        "B": {"t": tb, "run_bytes": by_b},
                    }
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
    finally:
        CE.SIMHASH_BAND_SHJ = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SIMHASH_SHJ_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
