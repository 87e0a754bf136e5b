"""Interleaved A/B for the fused level2 temporal shuffle
(domain/levels.LEVEL2_FUSED_TEMPORAL): times the raw->level2 prefix
AND the full level4 pipeline with the shipped three-join shape
(hour-grain SMJ + day-grain SMJ + as-of union) against the fused
single-shuffle union, alternating variants per repeat in ONE session
so host drift cancels. Every other scale flag stays at its shipped
auto default, so each variant is exactly what a user would get.

Motivation (LEVEL4_STAGES.json round12_clean_reprobe): level2's
temporal attachments dominate the level pipeline's x1000 cost —
+123 s and +20.4 GiB shuffle over the level1 prefix, because the
100M-row wide fact re-shuffles separately for each attachment while
the hour table (~23M rows at x1000, one per site-hour) is too big to
broadcast. The fused shape retires two full wide-fact exchanges.

Row identity across variants is pinned by tests/test_level2_fused.py;
this tool carries only a row-count guard. Sentinel-normalized per the
round-12 capture protocol (README "drift sentinel").

Usage: python tools/level2_fused_ab.py [dir:mult ...] [--repeats N]
  default corpora: sf0.1 (gate-off sanity), x100, x1000.
Writes LEVEL2_FUSED_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.domain import levels  # noqa: E402
from cosmoz_data_pipeline_spark.domain.synth import load_domain  # noqa: E402
from cosmoz_data_pipeline_spark.sentinel import (  # noqa: E402
    SENTINEL_REF_SEC,
    sentinel_sec,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402
from tools.scale_corpus import ensure_corpus  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.1", 0),
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

VARIANTS = (("joined", False), ("fused", True))
STAGES = ("level2", "level4")


def _one(spark, sf_dir: str, stage: str, fused: bool, count_rows: bool):
    levels.LEVEL2_FUSED_TEMPORAL = fused
    _cold(spark)
    d = load_domain(spark, sf_dir)
    df = levels.run_pipeline(
        d["raw_values"], d["intensity"], d["silo_data"], d["all_stations"]
    )[stage]
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    rows = df.count() if count_rows else None
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
    shipped = levels.LEVEL2_FUSED_TEMPORAL
    spark = build_session(
        app_name="level2-fused-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "level2_fused_ab",
        "unit": "sec",
        "repeats": repeats,
        "stages": list(STAGES),
        "shipped_variant": "auto (None = frame-input-bytes gate)"
        if shipped is None
        else ("fused" if shipped else "joined"),
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    try:
        for d, mult in corpora:
            if mult:
                ensure_corpus(spark, d, mult, tables=("events", "nation"))
            snt = sentinel_sec(spark, repeats=2)
            print(f"x{mult:<5d} sentinel {snt:.2f}s", flush=True)
            for stage in STAGES:
                rec = {key: {"t": []} for key, _ in VARIANTS}
                rec["sentinel_sec"] = snt
                rows_seen = set()
                for rep in range(repeats):
                    for key, fused in VARIANTS:
                        dt, rows, met = _one(spark, d, stage, fused, rep == 0)
                        rec[key]["t"].append(round(dt, 3))
                        if rows is not None:
                            rows_seen.add(rows)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"x{mult:<5d} {stage:7s} {key:7s} {dt:8.2f}s rows={rows}",
                            flush=True,
                        )
                if len(rows_seen) != 1:
                    raise RuntimeError(
                        f"variants disagree on row count: {rows_seen}"
                    )
                rec["rows"] = rows_seen.pop()
                for key, _ in VARIANTS:
                    rec[key]["best"] = min(rec[key]["t"])
                    rec[key]["best_normalized"] = round(
                        rec[key]["best"] * SENTINEL_REF_SEC / snt, 3
                    )
                rec["speedup_joined_over_fused"] = round(
                    rec["joined"]["best"] / rec["fused"]["best"], 3
                )
                out["corpora"][f"x{mult}:{stage}"] = rec
    finally:
        levels.LEVEL2_FUSED_TEMPORAL = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEVEL2_FUSED_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
