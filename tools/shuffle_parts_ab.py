"""Interleaved A/B over spark.sql.shuffle.partitions for the spill-
heavy x1000 queries: SCALE_r08 recorded level4 with 7.6 GiB memory
spill (alpha 1.05) and x_dedup_ngram_jaccard with 45.6 GiB (alpha
0.94) at 32 shuffle partitions — the per-task sort volume grows 10x
per decade while the partition count stays pinned at core count. AQE
only coalesces DOWN from the configured number, so the configured
number is the scale knob (the brief's "size shuffle.partitions so
partitions fit in executor memory at the target SF").

Times each query at each partition count in ONE session, interleaved
A/B/C per repeat so host drift cancels; shuffle.partitions is
runtime-settable so no session rebuild is needed. Records wall time
plus the best run's shuffle/spill bytes.

Usage: python tools/shuffle_parts_ab.py [dir:mult ...] [--repeats N]
       [--parts 32,128,256] [--queries level4,...]
Writes SHUFFLE_PARTS_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (("/tmp/cosmoz_scale_x1000", 1000),)
DEFAULT_PARTS = (32, 128, 256)
DEFAULT_QUERIES = ("level4", "x_dedup_ngram_jaccard")


def _one(spark, name: str, sf_dir: str, parts: int):
    # pin the variant: the engine's own corpus-byte sizing (round 8,
    # session.scale_shuffle_partitions) would otherwise override the
    # forced count at load time
    spark.conf.set("spark.cosmoz.shuffle.autosize", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    rows = REGISTRY[name].run(spark, sf_dir).count()
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    _cold(spark)
    return dt, rows, met


def _opt(args: list[str], flag: str, default: str) -> str:
    if flag in args:
        i = args.index(flag)
        val = args[i + 1]
        del args[i : i + 2]
        return val
    return default


def main() -> None:
    args = sys.argv[1:]
    repeats = int(_opt(args, "--repeats", "2"))
    parts = tuple(int(p) for p in _opt(args, "--parts", "").split(",") if p) or (
        DEFAULT_PARTS
    )
    queries = tuple(
        q for q in _opt(args, "--queries", "").split(",") if q
    ) or DEFAULT_QUERIES
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="shuffle-parts-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    out = {"metric": "shuffle_parts_ab", "unit": "sec", "repeats": repeats,
           "parts": list(parts), "corpora": {}}
    try:
        for d, mult in corpora:
            per_q = {}
            for name in queries:
                rec = {str(p): {"t": []} for p in parts}
                rows_seen = set()
                for _ in range(repeats):
                    for p in parts:
                        dt, rows, met = _one(spark, name, d, p)
                        key = str(p)
                        rec[key]["t"].append(round(dt, 3))
                        rows_seen.add(rows)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"x{mult:<5d} {name:24s} parts={p:<4d} "
                            f"{dt:8.2f}s rows={rows} "
                            f"spill={((met or {}).get('disk_spill_bytes', 0)) >> 20}"
                            f"+{((met or {}).get('mem_spill_bytes', 0)) >> 20}MiB",
                            flush=True,
                        )
                assert len(rows_seen) == 1, (
                    f"{name}: partition counts disagree on rows: {rows_seen}"
                )  # parallelism is physical, never semantic
                rec["rows"] = rows_seen.pop()
                for p in parts:
                    rec[str(p)]["best"] = min(rec[str(p)]["t"])
                per_q[name] = rec
            out["corpora"][f"x{mult}"] = per_q
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        # _one disables the engine's autosize per run; restore it so a
        # shared/long-lived session gets its spill-aware sizing back
        spark.conf.set("spark.cosmoz.shuffle.autosize", "true")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SHUFFLE_PARTS_AB.json",
    )
    if os.path.exists(path):  # merge: later runs add corpora/queries
        try:
            with open(path) as f:
                prev = json.load(f)
            for corpus, per_q in out["corpora"].items():
                prev.setdefault("corpora", {}).setdefault(corpus, {}).update(per_q)
            prev["repeats"] = repeats
            if sorted(prev.get("parts", [])) != sorted(parts):
                # runs may probe different counts; record the union
                prev["parts"] = sorted(set(prev.get("parts", [])) | set(parts))
            out = prev
        except (OSError, json.JSONDecodeError, KeyError):
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
