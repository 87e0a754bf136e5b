"""Durable-checkpoint tax (round 6, VERDICT r5 task 5): what does
switching the iterative loops' lineage truncation from executor-local
``localCheckpoint`` to a RELIABLE ``checkpoint`` directory
(``spark.cosmoz.checkpoint.dir`` — the conf a real cluster sets so a
multi-superstep job survives executor loss) cost in wall time?

Measures the two iterative queries — ``x_dedup_components``
(per-superstep eager checkpoints) and the cold IVF index build
(``x_ann_ivf_topk_train``: lazy Lloyd chain + eager final + add) —
with the conf UNSET (A, local) and SET to a scratch dir (B, durable),
interleaved A/B/A/B per pass on one session so host drift cancels
(the BENCH_AB_r06 protocol), min over passes, cold caches/memos per
run, checkpoint scratch wiped between runs so no run reads a
predecessor's files.

Usage: python tools/checkpoint_tax.py [--passes 3] [--sf-dir DIR]
Prints a JSON line and a README-ready markdown table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402

QUERIES = ("x_dedup_components", "x_ann_ivf_topk_train")


def _cold(spark) -> None:
    release_persists()
    spark.catalog.clearCache()
    catalog_ext._IVF_CENTROIDS.clear()
    catalog_ext.clear_counts()
    catalog_ext._AUG_OFF.clear()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = build_session(app_name="checkpoint-tax")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/nation.parquet").count()  # warmup
    ckdir = tempfile.mkdtemp(prefix="cosmoz_ck_tax_")

    def run(name: str, durable: bool) -> float:
        _cold(spark)
        shutil.rmtree(ckdir, ignore_errors=True)
        os.makedirs(ckdir, exist_ok=True)
        if durable:
            spark.conf.set("spark.cosmoz.checkpoint.dir", ckdir)
        else:
            spark.conf.unset("spark.cosmoz.checkpoint.dir")
        t0 = time.time()
        REGISTRY[name].run(spark, args.sf_dir).count()
        return time.time() - t0

    local: dict[str, float] = {}
    durable: dict[str, float] = {}
    try:
        for p in range(args.passes):
            for name in QUERIES:
                order = [(False, local), (True, durable)]
                if p % 2:
                    order.reverse()
                for is_durable, acc in order:
                    sec = run(name, is_durable)
                    acc[name] = min(acc.get(name, sec), sec)
            print(f"pass {p + 1}/{args.passes} done", file=sys.stderr)
    finally:
        spark.conf.unset("spark.cosmoz.checkpoint.dir")
        shutil.rmtree(ckdir, ignore_errors=True)

    print("\n| query | localCheckpoint | durable checkpoint | tax |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name in QUERIES:
        tax = durable[name] / local[name] - 1
        print(
            f"| `{name}` | {local[name]:.2f} s | {durable[name]:.2f} s "
            f"| {tax:+.0%} |",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "durable_checkpoint_tax",
                "sf_dir": args.sf_dir,
                "passes": args.passes,
                "policy": "interleaved local/durable per pass, min over passes, "
                "cold caches+memos per run, checkpoint scratch wiped per run",
                "local_sec": {k: round(v, 3) for k, v in local.items()},
                "durable_sec": {k: round(v, 3) for k, v in durable.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
