"""Interleaved A/B for the IVF assignment-kernel shape
(plans/catalog_ext.IVF_ASSIGN_NUMPY): times the cold
x_ann_ivf_topk_train build (train + add, index memo cleared per run)
with the HOF fold assignment (explode -> broadcast-join -> hash
argmin, every distance an interpreted aggregate() fold) against the
Arrow/numpy mapInPandas kernel (D2 = qq + ww - 2 Q@W.T as exact
float64 integer matmuls, two-level mask + argmin in-batch) in ONE
session, alternating variants per repeat so host drift cancels.

Motivation: after IVF_D2_EXPAND the train is still fold-bound
(IVF_TRAIN_STAGES.json: add_assign + Lloyd sample assignments are
~92 % of the x1000 train) and the per-element interpreter cost of
HOF reductions is the floor (tools/ivf_fold_micro.py) — BLAS-blocked
matmul does the same exact integer arithmetic at vector width. The
variants are bit-identical by integer-exactness of float64 below
2^53 (guarded at 2^22 per component in the kernel; tie-breaks
replicated — pinned by tests/test_ivf_assign_kernel.py); the tool
additionally compares a full cell-hash of the trained centroid table
across variants and raises on any difference.

Usage: python tools/ivf_assign_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000.
Writes IVF_ASSIGN_AB.json at the repo root.
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

VARIANTS = (("hof", False), ("numpy", True))


def _one(spark, sf_dir: str, kernel: bool):
    CE.IVF_ASSIGN_NUMPY = kernel
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
    shipped = CE.IVF_ASSIGN_NUMPY
    spark = build_session(
        app_name="ivf-assign-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "ivf_assign_ab", "unit": "sec", "repeats": repeats,
           "query": "x_ann_ivf_topk_train (cold: train + add)",
           "shipped_variant": "auto (None = corpus-gated)"
           if shipped is None else ("numpy" if shipped else "hof"),
           "corpora": {}}
    try:
        for d, mult in corpora:
            rec = {key: {"t": []} for key, _ in VARIANTS}
            sigs_seen = set()
            for _ in range(repeats):
                for key, kernel in VARIANTS:
                    dt, rows, met, sig = _one(spark, d, kernel)
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
            rec["speedup_hof_over_numpy"] = round(
                rec["hof"]["best"] / rec["numpy"]["best"], 3
            )
            out["corpora"][f"x{mult}"] = rec
    finally:
        CE.IVF_ASSIGN_NUMPY = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IVF_ASSIGN_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
