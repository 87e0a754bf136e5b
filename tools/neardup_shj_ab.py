"""Interleaved A/B for the neardup verify-join strategy
(NEARDUP_VERIFY_HINT hook): times x_embed_cosine_neardup with the
planner default (broadcast/sort-merge verify — the SHIPPED shape)
vs a forced shuffle-hash verify in ONE session, alternating A/B/A/B
per corpus so host drift cancels (the same protocol as
tools/bench_ab.py, in-process because the variants differ by one
module hook rather than a git snapshot). Records per-variant
best-of-N wall time plus the best run's shuffle/spill bytes off the
status REST API.

Round-8 verdict (NEARDUP_SHJ_AB.json): the hinted shape LOST at both
x100 (22.9 s vs 52.7 s) and x1000 (226 s vs 282 s) despite avoiding
SCALE_r08's 26.6 GiB sort spill — the hook exists so a future corpus
or Spark version can re-take the measurement, not because the hint
is ever shipped.

Usage: python tools/neardup_shj_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000 (past broadcast size, where the
  strategies actually diverge).
Writes NEARDUP_SHJ_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

VARIANTS = (("smj", None), ("shj", "shuffle_hash"))


def _one(spark, sf_dir: str, hint):
    catalog_ext.NEARDUP_VERIFY_HINT = hint
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    rows = REGISTRY["x_embed_cosine_neardup"].run(spark, sf_dir).count()
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
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    # same sizing as the scale sweep: the x1000 decade needs the
    # production-executor-like 64 g, and the UI feeds _metrics_since
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="neardup-shj-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "neardup_shj_ab", "unit": "sec", "repeats": repeats,
           "shipped_variant": "smj", "corpora": {}}
    try:
        for d, mult in corpora:
            rec = {"smj": {"t": []}, "shj": {"t": []}}
            rows_seen = set()
            for _ in range(repeats):
                for key, hint in VARIANTS:
                    dt, rows, met = _one(spark, d, hint)
                    rec[key]["t"].append(round(dt, 3))
                    rows_seen.add(rows)
                    # keep the metrics of the best run per variant
                    # (compare the rounded value actually stored —
                    # raw-vs-rounded equality never fired)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    print(f"x{mult:<5d} {key}  {dt:8.2f}s rows={rows}",
                          flush=True)
            assert len(rows_seen) == 1, (
                f"variants disagree on row count: {rows_seen}"
            )  # the gate is a physical-strategy switch, never semantic
            rec["rows"] = rows_seen.pop()
            for key in ("smj", "shj"):
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_smj_over_shj"] = round(
                rec["smj"]["best"] / rec["shj"]["best"], 3
            )
            out["corpora"][f"x{mult}"] = rec
    finally:
        catalog_ext.NEARDUP_VERIFY_HINT = None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NEARDUP_SHJ_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
