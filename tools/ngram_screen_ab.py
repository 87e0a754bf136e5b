"""Interleaved A/B for the n-gram-Jaccard size-ratio screen
(catalog_ext.NGRAM_SIZE_SCREEN): times x_dedup_ngram_jaccard with
every candidate going straight to the exact shingle-array verify join
vs the screened shape (16-byte size rows first, pairs whose
min/max size ratio cannot reach the 0.6 threshold never ship their
arrays) in ONE session, alternating variants per repeat so host drift
cancels — the protocol of tools/neardup_prescreen_ab.py, whose
head-16 screen this generalizes to variable-size sets.

The screen is output-invariant (J <= min|A|,|B| / max|A|,|B|;
tests/test_ngram_screen.py), so the A/B asserts identical row counts.

Usage: python tools/ngram_screen_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000.
Writes NGRAM_SCREEN_AB.json at the repo root.
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

VARIANTS = (("off", False), ("screen", True))


def _one(spark, sf_dir: str, on: bool):
    catalog_ext.NGRAM_SIZE_SCREEN = on
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    rows = REGISTRY["x_dedup_ngram_jaccard"].run(spark, sf_dir).count()
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
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = catalog_ext.NGRAM_SIZE_SCREEN
    spark = build_session(
        app_name="ngram-screen-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "ngram_screen_ab", "unit": "sec", "repeats": repeats,
           "shipped_variant": "screen" if shipped else "off", "corpora": {}}
    try:
        for d, mult in corpora:
            rec = {key: {"t": []} for key, _ in VARIANTS}
            rows_seen = set()
            for _ in range(repeats):
                for key, on in VARIANTS:
                    dt, rows, met = _one(spark, d, on)
                    rec[key]["t"].append(round(dt, 3))
                    rows_seen.add(rows)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    print(f"x{mult:<5d} {key:7s} {dt:8.2f}s rows={rows}",
                          flush=True)
            if len(rows_seen) != 1:  # raise, not assert: asserts
                # vanish under python -O and this is the measurement
                # path's only semantic-equivalence guard
                raise RuntimeError(
                    f"variants disagree on row count: {rows_seen}"
                )
            rec["rows"] = rows_seen.pop()
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_off_over_screen"] = round(
                rec["off"]["best"] / rec["screen"]["best"], 3
            )
            out["corpora"][f"x{mult}"] = rec
    finally:
        catalog_ext.NGRAM_SIZE_SCREEN = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NGRAM_SCREEN_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
