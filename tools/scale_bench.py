"""One-decade scaling evidence (VERDICT r3 task 8): time the most
expensive registry queries on an x1 and an x10 corpus produced by the
SAME generator (tools/scale_corpus.py) and report the per-query scaling
exponent alpha where t ~ N^alpha (alpha = log10(t_x10 / t_x1)).

Candidate-then-verify joins and the level pipeline should be
near-linear (alpha ~ 1); an alpha near 2 would expose a hidden
all-pairs join that small-SF correctness runs can't see.

Each timing is cold: scope-tracked persists are released, the SQL
cache cleared, and the IVF/corpus-count memos reset between runs, so
min-of-2 measures a full cold execution at both scales.

Usage: python tools/scale_bench.py [x1_dir x10_dir]   (generates into
/tmp/cosmoz_scale_{x1,x10} if dirs are omitted), writes SCALE_r04.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_corpus import generate  # noqa: E402

QUERIES = (
    "level4",
    "x_dedup_simhash_pairs",
    "x_dedup_components",
    "x_embed_cosine_neardup",
    "x_ann_ivf_topk",
)


def _cold(spark) -> None:
    release_persists()
    spark.catalog.clearCache()
    catalog_ext._IVF_CENTROIDS.clear()
    catalog_ext._EMB_AUG_COUNT.clear()


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = math.inf, 0
    for _ in range(runs):
        _cold(spark)
        t0 = time.time()
        rows = REGISTRY[name].run(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    _cold(spark)
    return round(best, 3), rows


def main() -> None:
    if len(sys.argv) > 2:
        d1, d10 = sys.argv[1], sys.argv[2]
    else:
        d1, d10 = "/tmp/cosmoz_scale_x1", "/tmp/cosmoz_scale_x10"
    spark = build_session(app_name="scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for d, mult in ((d1, 1), (d10, 10)):
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"generating x{mult} corpus at {d} ...", file=sys.stderr)
            generate(spark, d, mult)

    out: dict[str, dict] = {}
    for name in QUERIES:
        t1, r1 = time_query(spark, name, d1)
        t10, r10 = time_query(spark, name, d10)
        alpha = round(math.log10(t10 / t1), 3)
        out[name] = {
            "t_x1_sec": t1,
            "t_x10_sec": t10,
            "rows_x1": r1,
            "rows_x10": r10,
            "scaling_exponent": alpha,
        }
        print(f"{name:28s} x1={t1:7.2f}s x10={t10:7.2f}s alpha={alpha}", file=sys.stderr)

    result = {
        "metric": "one_decade_scaling",
        "corpus": "tools/scale_corpus.py x1 vs x10 (same generator both scales)",
        "policy": "min-of-2 cold (persists released, caches + index memos cleared)",
        "queries": out,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_r04.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
