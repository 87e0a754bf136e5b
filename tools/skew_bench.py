"""Skew-resilience evidence for the 100× scale claim (VERDICT r2 task
8): run the level1→level2 pipeline over (a) the uniform 8-site domain
and (b) a skewed remap where sites 1-4 collapse onto site 1 (~50 % of
all rows on ONE key — every site_no-keyed shuffle, window and as-of in
the pipeline hits the hot key), and report min-of-2 wall times + the
skew/uniform ratio. AQE skew-join splitting and the window ops'
per-key-but-many-partition layout should keep the ratio near 1; a
quadratic or single-reducer path would blow it up ~4×.

Usage: python tools/skew_bench.py [sf_dir]   (default sf0.1)
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
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402


def run_level2(spark, d, raw) -> tuple[float, int]:
    t0 = time.time()
    out = levels.run_pipeline(
        raw, d["intensity"], d["silo_data"], d["all_stations"]
    )["level2"]
    n = out.count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="cosmoz-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_domain(spark, sf_dir)
    uniform = d["raw_values"]
    # sites 1-4 → 1: one hot key carrying ~50 % of rows
    skewed = uniform.withColumn(
        "site_no",
        F.when(F.col("site_no") <= 4, F.lit(1)).otherwise(F.col("site_no")),
    )
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # JVM warmup

    times = {"uniform": [], "skewed": []}
    counts = {}
    for _ in range(2):
        for name, raw in (("uniform", uniform), ("skewed", skewed)):
            dt, n = run_level2(spark, d, raw)
            times[name].append(dt)
            counts[name] = n
    tu, ts = min(times["uniform"]), min(times["skewed"])
    print(
        json.dumps(
            {
                "metric": "level2_skew_ratio",
                "uniform_sec": round(tu, 3),
                "skewed_sec": round(ts, 3),
                "ratio": round(ts / tu, 3),
                "rows": counts,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
