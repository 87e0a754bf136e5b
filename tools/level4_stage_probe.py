"""Per-stage decade exponents for the level pipeline (round 9,
VERDICT r8 task 4 follow-through): SCALE_r09.json measured level4 at
alpha=1.100 (x100->x1000, zero spill) while the bare
repartition+sort of the same input bytes runs alpha=0.722 — so the
README's r8 attribution of the residual to the O(N log N) sort floor
is contradicted by measurement and the superlinear term lives in a
specific stage. This probe times each cumulative pipeline prefix
(raw->l1, ->l2, ->l3, ->l4) cold at each corpus decade through a noop
write (no result materialization, no sort elimination), so the
per-stage marginal cost and its decade exponent fall out by
subtraction.

Context that shapes interpretation: the synthetic domain has
N_SITES=8 fixed sites at fixed 20-min cadence (domain/synth.py), so
corpus decades EXTEND THE TIME SPAN — every site_no-partitioned
window sort is an 8-way-parallel stage whose per-task volume grows
10x per decade, while 32-way hash/scan stages stay fully parallel.
A production deployment adds sites (the reference hand-sharded one OS
process per site); per-site density, not site count, is this probe's
scaling axis.

Usage: python tools/level4_stage_probe.py [dir:mult ...]
  default: x10, x100, x1000
Writes LEVEL4_STAGES.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.domain import levels  # noqa: E402
from cosmoz_data_pipeline_spark.domain.synth import load_domain  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from cosmoz_data_pipeline_spark.sentinel import (  # noqa: E402
    SENTINEL_REF_SEC,
    io_sentinel_sec,
    io_window,
    sentinel_sec,
)
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x10", 10),
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

STAGES = ("level1", "level2", "level3", "level4")


def _prefix_df(spark, sf_dir: str, stage: str):
    d = load_domain(spark, sf_dir)
    return levels.run_pipeline(
        d["raw_values"], d["intensity"], d["silo_data"], d["all_stations"]
    )[stage]


def _one(spark, sf_dir: str, stage: str, runs: int = 2):
    best, met = math.inf, None
    for _ in range(runs):
        _cold(spark)
        df = _prefix_df(spark, sf_dir, stage)
        hwm = _stage_hwm(spark)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if dt < best:
            best, met = dt, _metrics_since(spark, hwm)
    _cold(spark)
    return round(best, 3), met


def main() -> None:
    args = sys.argv[1:]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="level4-stage-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "level4_stage_decades",
        "unit": "sec",
        "policy": "min-of-2 cold per (stage-prefix, corpus); each prefix is "
        "the CUMULATIVE plan raw->stage executed via a noop write, so "
        "stage marginal cost = prefix[k] - prefix[k-1] (one session, "
        "interleaved by corpus inside each stage so drift lands evenly)",
        "stages": {},
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "sentinel_sec": None,  # filled below, captured once per session
    }
    out["sentinel_sec"] = sentinel_sec(spark, repeats=2)
    prev_t = {f"x{m}": 0.0 for _, m in corpora}
    for stage in STAGES:
        rec = {"t_sec": {}, "run_bytes": {}, "marginal_t_sec": {}}
        for d, mult in corpora:
            # io brackets on the multi-GB-shuffle decades (r13): the
            # window column says whether this cell's raw seconds are
            # citable or run_bytes-only
            io_pre = io_sentinel_sec(spark, repeats=1) if mult >= 1000 else None
            t, met = _one(spark, d, stage)
            key = f"x{mult}"
            if io_pre is not None:
                io_post = io_sentinel_sec(spark, repeats=1)
                rec.setdefault("io_sentinel_sec", {})[key] = {
                    "pre": io_pre,
                    "post": io_post,
                    "window": io_window(io_pre, io_post),
                }
            rec["t_sec"][key] = t
            rec["run_bytes"][key] = met
            rec["marginal_t_sec"][key] = round(t - prev_t[key], 3)
            print(
                f"{stage:8s} x{mult:<5d} {t:8.2f}s (marginal "
                f"{rec['marginal_t_sec'][key]:+.2f}s) "
                f"spill={((met or {}).get('disk_spill_bytes', 0)) >> 20}"
                f"+{((met or {}).get('mem_spill_bytes', 0)) >> 20}MiB",
                flush=True,
            )
        keys = [f"x{m}" for _, m in corpora]
        rec["alpha_per_decade"] = {
            f"{keys[i]}->{keys[i + 1]}": round(
                math.log10(rec["t_sec"][keys[i + 1]] / rec["t_sec"][keys[i]])
                / math.log10(corpora[i + 1][1] / corpora[i][1]),
                3,
            )
            for i in range(len(keys) - 1)
        }
        for k in keys:
            prev_t[k] = rec["t_sec"][k]
        out["stages"][stage] = rec
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEVEL4_STAGES.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
