"""Interleaved A/B for the IVF distance-kernel shape
(plans/catalog_ext.IVF_D2_EXPAND): times the cold x_ann_ivf_topk_train
build (train + add, index memo cleared per run) with the pairwise
zip_with+aggregate l2sq fold against the expanded
d2 = a·a − 2·a·b + b·b form (self-dots precomputed per row/centroid/
rep) in ONE session, alternating variants per repeat so host drift
cancels.

Motivation (IVF_TRAIN_STAGES.json, round 10): 127 s of the 138.5 s
x1000 train is distance folds (add_assign 68.6 s + Lloyd sample
assignments 58.6 s); the expansion halves per-candidate array passes.
The variants are bit-identical by integer arithmetic identity (pinned
on both assignment branches by tests/test_ivf_d2_expand.py); the tool
additionally compares a full cell-hash of the trained centroid table
across variants and raises on any difference.

Usage: python tools/ivf_kernel_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000.
Writes IVF_KERNEL_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext as CE  # noqa: E402
from cosmoz_data_pipeline_spark.plans.registry import release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)

VARIANTS = (("l2fold", False), ("d2expand", True))


def _one(spark, sf_dir: str, expand: bool):
    CE.IVF_D2_EXPAND = expand
    CE._IVF_CENTROIDS.clear()  # cold build: the one-time index cost
    release_persists()
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY["x_ann_ivf_topk_train"].run(spark, sf_dir)
    rows = df.count()
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    # cross-variant identity: order-insensitive cell hash of the full
    # centroid table (bit_xor of per-row xxhash64 — no overflow)
    sig = df.agg(
        F.expr("bit_xor(xxhash64(j, i, w))").alias("s"),
        F.count(F.lit(1)).alias("c"),
    ).collect()[0]
    release_persists()
    CE._IVF_CENTROIDS.clear()
    _cold(spark)
    return dt, rows, met, (sig["s"], sig["c"])


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
    shipped = CE.IVF_D2_EXPAND
    spark = build_session(
        app_name="ivf-kernel-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "ivf_kernel_ab", "unit": "sec", "repeats": repeats,
           "query": "x_ann_ivf_topk_train (cold: train + add)",
           "shipped_variant": "d2expand" if shipped else "l2fold",
           "corpora": {}}
    try:
        for d, mult in corpora:
            rec = {key: {"t": []} for key, _ in VARIANTS}
            sigs_seen = set()
            for _ in range(repeats):
                for key, expand in VARIANTS:
                    dt, rows, met, sig = _one(spark, d, expand)
                    rec[key]["t"].append(round(dt, 3))
                    sigs_seen.add(sig)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    rec[key]["rows"] = rows
                    print(f"x{mult:<5d} {key:9s} {dt:8.2f}s rows={rows} sig={sig}",
                          flush=True)
            if len(sigs_seen) != 1:  # raise, not assert: asserts
                # vanish under python -O and this is the measurement
                # path's only semantic-equivalence guard
                raise RuntimeError(
                    f"variants disagree on centroid cell-hash: {sigs_seen}"
                )
            rec["centroid_sig"] = list(sigs_seen.pop())
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_l2fold_over_d2expand"] = round(
                rec["l2fold"]["best"] / rec["d2expand"]["best"], 3
            )
            out["corpora"][f"x{mult}"] = rec
    finally:
        CE.IVF_D2_EXPAND = shipped
        CE._IVF_CENTROIDS.clear()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IVF_KERNEL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
