"""Interleaved A/B for the level1 duplicate-window sort-key layout
(domain/levels.LEVEL1_DUPW_HASH): times the flagship level4 pipeline
with the composite-key duplicate window (partitionBy site_no + all 15
payload columns) against the hash-prefixed variant (partitionBy
xxhash64(payload), order by payload struct + time, null-safe struct
equality on the lagged row) in ONE session, alternating variants per
repeat so host drift cancels.

Motivation (LEVEL4_STAGES.json, round 9): the level pipeline's
superlinear decade exponent (level4 alpha=1.100 vs a 0.722 bare sort
floor, SCALE_r09.json) localizes to the raw->level1 prefix
(5.96 s -> 79.9 s, alpha=1.127), whose duplicate window sorts 100 M
wide rows by a 16-field key with an 8-value leading column — Spark's
8-byte sort-prefix comparison resolves almost nothing there, while
the variant's leading hash resolves nearly every comparison. The
variant is EXACT (identical payloads stay contiguous inside a hash
partition; collisions are separated by the struct sort and fail the
null-safe equality) — pinned by tests/test_level1_dupw_hash.py.

Usage: python tools/level1_dupw_ab.py [dir:mult ...] [--repeats N]
       [--query NAME]
  default corpora: x100 and x1000; default query: level4.
Writes LEVEL1_DUPW_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.domain import levels  # noqa: E402
from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

VARIANTS = (("composite", False), ("hash", True))


def _one(spark, name: str, sf_dir: str, use_hash: bool):
    levels.LEVEL1_DUPW_HASH = use_hash
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    rows = REGISTRY[name].run(spark, sf_dir).count()
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    _cold(spark)
    return dt, rows, met


def main() -> None:
    args = sys.argv[1:]
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    name = "level4"
    if "--query" in args:
        i = args.index("--query")
        name = args[i + 1]
        del args[i : i + 2]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = levels.LEVEL1_DUPW_HASH
    spark = build_session(
        app_name="level1-dupw-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "level1_dupw_ab", "unit": "sec", "repeats": repeats,
           "query": name,
           "shipped_variant": "hash" if shipped else "composite",
           "corpora": {}}
    try:
        for d, mult in corpora:
            rec = {key: {"t": []} for key, _ in VARIANTS}
            rows_seen = set()
            for _ in range(repeats):
                for key, use_hash in VARIANTS:
                    dt, rows, met = _one(spark, name, d, use_hash)
                    rec[key]["t"].append(round(dt, 3))
                    rows_seen.add(rows)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    print(f"x{mult:<5d} {key:9s} {dt:8.2f}s rows={rows}",
                          flush=True)
            if len(rows_seen) != 1:  # the switch is a sort-key
                # layout, never semantic; a hard raise (not assert,
                # which vanishes under python -O) is the measurement
                # path's only semantic-equivalence guard
                raise RuntimeError(
                    f"variants disagree on row count: {rows_seen}"
                )
            rec["rows"] = rows_seen.pop()
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_composite_over_hash"] = round(
                rec["composite"]["best"] / rec["hash"]["best"], 3
            )
            key = f"x{mult}" if name == "level4" else f"x{mult}:{name}"
            out["corpora"][key] = rec
    finally:
        levels.LEVEL1_DUPW_HASH = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LEVEL1_DUPW_AB.json",
    )
    if os.path.exists(path):  # merge: later runs add corpora/queries
        try:
            with open(path) as f:
                prev = json.load(f)
            prev.setdefault("corpora", {}).update(out["corpora"])
            out = prev
        except (OSError, json.JSONDecodeError):
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
