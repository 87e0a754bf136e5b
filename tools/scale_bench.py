"""Multi-decade scaling evidence (VERDICT r3 task 8, extended): time
the most expensive registry queries on x1 / x10 / x100 corpora
produced by the SAME generator (tools/scale_corpus.py) and report the
per-decade scaling exponent alpha where t ~ N^alpha
(alpha = log10(t_next / t_prev) per 10x step).

Candidate-then-verify joins and the level pipeline should be
near-linear (alpha <= ~1); an alpha near 2 would expose a hidden
all-pairs join that small-SF correctness runs can't see. The second
decade (x10 -> x100) is the informative one: at x1 -> x10 fixed
per-job overhead still dominates wall time on local[32].

Each timing is cold: scope-tracked persists are released, the SQL
cache cleared, and the IVF/corpus-count memos reset between runs, so
min-of-2 measures a full cold execution at every scale.

Usage: python tools/scale_bench.py [dir:mult ...]
  default: /tmp/cosmoz_scale_x1:1 /tmp/cosmoz_scale_x10:10
           /tmp/cosmoz_scale_x100:100
Writes SCALE_r04.json at the repo root.
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

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x1", 1),
    ("/tmp/cosmoz_scale_x10", 10),
    ("/tmp/cosmoz_scale_x100", 100),
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
    if len(sys.argv) > 1:
        corpora = [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in sys.argv[1:]]
    else:
        corpora = list(DEFAULT_CORPORA)
    spark = build_session(app_name="scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for d, mult in corpora:
        if not os.path.exists(f"{d}/embeddings.parquet"):
            print(f"generating x{mult} corpus at {d} ...", file=sys.stderr)
            generate(spark, d, mult)

    out: dict[str, dict] = {}
    for name in QUERIES:
        times, rows = [], []
        for d, mult in corpora:
            t, r = time_query(spark, name, d)
            times.append(t)
            rows.append(r)
            print(f"{name:28s} x{mult:<4d} {t:8.2f}s rows={r}", file=sys.stderr)
        alphas = [
            round(
                math.log10(times[i + 1] / times[i])
                / math.log10(corpora[i + 1][1] / corpora[i][1]),
                3,
            )
            for i in range(len(corpora) - 1)
        ]
        out[name] = {
            "t_sec": {f"x{mult}": t for (_, mult), t in zip(corpora, times)},
            "rows": {f"x{mult}": r for (_, mult), r in zip(corpora, rows)},
            "scaling_exponent_per_decade": {
                f"x{corpora[i][1]}->x{corpora[i + 1][1]}": alphas[i]
                for i in range(len(alphas))
            },
        }

    result = {
        "metric": "multi_decade_scaling",
        "corpus": "tools/scale_corpus.py (same generator at every scale)",
        "policy": "min-of-2 cold (persists released, caches + index memos cleared)",
        "queries": out,
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_r04.json",
        ),
        "w",
    ) as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
