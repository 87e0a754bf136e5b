"""Interleaved A/B for the fused level1 scan
(domain/levels.LEVEL1_DUP_SUBSET): times the raw->level1 prefix AND
the full level4 pipeline with the shipped two-window shape (bucketed
lag exchange + full-fact hash duplicate window) against the fused
scan (one (site, week-bucket) exchange carrying prev_count + the
±29-min candidate screen, exact dup confirm on the ~2/7 candidate
subset), alternating variants per repeat in ONE session. Every other
flag stays at its shipped auto default (fused level2 engages at this
scale on both sides).

Row identity is pinned by tests/test_level1_dup_subset.py; this tool
carries a row-count guard. Sentinel per the round-12 protocol.

Usage: python tools/level1_dup_subset_ab.py [dir:mult ...] [--repeats N]
  default corpus: x1000 — the scale the auto gate WOULD ship it at
  under LEVEL1_DUP_SUBSET=None (the None gate engages >=512 MiB ~
  x250; x100 is below it). The SHIPPED default is False (measured
  out; never auto-engaged at any scale) — see the module comment at
  domain/levels.py next to LEVEL1_DUP_SUBSET.
Writes LEVEL1_DUPSUBSET_AB.json at the repo root.
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
    io_sentinel_sec,
    sentinel_sec,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402
from tools.scale_corpus import ensure_corpus  # noqa: E402

DEFAULT_CORPORA = (("/tmp/cosmoz_scale_x1000", 1000),)

VARIANTS = (("twowin", False), ("subset", True))
STAGES = ("level1", "level4")


def _one(spark, sf_dir: str, stage: str, subset: bool, count_rows: bool):
    levels.LEVEL1_DUP_SUBSET = subset
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
    repeats = 3
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
    shipped = levels.LEVEL1_DUP_SUBSET
    spark = build_session(
        app_name="level1-dup-subset-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "level1_dup_subset_ab",
        "unit": "sec",
        "repeats": repeats,
        "stages": list(STAGES),
        "shipped_variant": "auto (None = frame-input-bytes gate)"
        if shipped is None
        else ("subset" if shipped else "twowin"),
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    try:
        for d, mult in corpora:
            ensure_corpus(spark, d, mult, tables=("events", "nation"))
            snt = sentinel_sec(spark, repeats=2)
            print(f"x{mult:<5d} sentinel {snt:.2f}s", flush=True)
            for stage in STAGES:
                rec = {key: {"t": []} for key, _ in VARIANTS}
                rec["sentinel_sec"] = snt
                rec["io_sentinel_sec"] = {"pre": io_sentinel_sec(spark, repeats=1)}
                rows_seen = set()
                for rep in range(repeats):
                    for key, subset in VARIANTS:
                        dt, rows, met = _one(spark, d, stage, subset, rep == 0)
                        rec[key]["t"].append(round(dt, 3))
                        if rows is not None:
                            rows_seen.add(rows)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"x{mult:<5d} {stage:7s} {key:7s} {dt:8.2f}s rows={rows}",
                            flush=True,
                        )
                rec["io_sentinel_sec"]["post"] = io_sentinel_sec(spark, repeats=1)
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
                rec["speedup_twowin_over_subset"] = round(
                    rec["twowin"]["best"] / rec["subset"]["best"], 3
                )
                out["corpora"][f"x{mult}:{stage}"] = rec
    finally:
        levels.LEVEL1_DUP_SUBSET = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEVEL1_DUPSUBSET_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
