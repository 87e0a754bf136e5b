"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is forced with a count() (no driver-side row materialization
— we measure engine execution, not Arrow transfer). A warmup run of a
trivial action first absorbs JVM/codegen startup. Every query runs
twice and reports the fastest run: we are measuring the engine's
steady-state plan execution, not JIT warmup or transient host noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402

# Round 3 broadened the set (VERDICT r2 task 7): every level, the
# stateful-streaming op, and the round-3 rebuilt candidate-verify /
# trained-IVF queries, so regressions in those paths show per round.
# Round 4 added the DEPLOYED shape (VERDICT r3 task 4): the reference's
# cron path is the incremental-overwrite/stream-dedup/NMDB-fetch chain
# (reference process_levels.sh:19-20, contrib/docker/docker-compose.yml:149),
# so st1/st6/s07 — plus j10/a02 — now carry a per-round perf signal.
HEADLINE = (
    "s01_scan_pushdown",
    "a01_pricing_summary",
    "j01_dim_join_rollup",
    "j02_fact_fact_join",
    "w01_lag_delta",
    "w03_centered_time_avg",
    "j05_asof_backward_join",
    "j07_windowed_dedup",
    "j10_near_duplicate_pairs",
    "a02_last_star_selector",
    "st1_incremental_overwrite",
    "st6_stream_dedup_watermark",
    "s07_nmdb_fetch_parse",
    "level1",
    "level2",
    "level3",
    "level4",
    "st5_stateful_validity",
    "x_dedup_exact",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash_pairs",
    "x_dedup_ngram_jaccard",
    "x_dedup_components",
    "x_decontaminate",
    "x_embed_cosine_neardup",
    "x_ann_cosine_topk",
    "x_ann_ivf_topk",
    "x_text_langid_quality",
    "x_text_fingerprint",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = build_session(app_name="cosmoz-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer reads
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    # Measurement policy (changed in round 3 — affects r2→r3 deltas):
    # clearCache after EVERY query run, so each timing is a cold-cache
    # execution of the full plan. Round-2 numbers kept per-query
    # persists alive across passes, so min-of-2 often measured a warm
    # rerun that skipped the persisted subplan entirely (e.g.
    # x_dedup_minhash_lsh 1.39s warm vs ~3s cold) — those were not
    # comparable to a real first execution. min-of-3 now absorbs
    # host/JIT noise instead.
    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            q = REGISTRY[name]
            t0 = time.time()
            q.run(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            release_persists()  # free scope-tracked intermediates
            spark.catalog.clearCache()  # cold-cache policy between runs

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "policy": "min-of-3, cold cache per run (clearCache between runs; "
                "r2 numbers were warm-cache min-of-2 — not comparable)",
            }
        )
    )


if __name__ == "__main__":
    main()
