"""Micro A/B of integer squared-distance kernel SHAPES on the real
x1000 quantized vectors (round 10): one stage, ~100M 64-dim
evaluations (2M vectors x 50 broadcast centroids, global sum so
nothing but the fold is measured). Variants:

  l2sq_fold    shipped: aggregate(zip_with(a,b,(x,y)->(x-y)^2))
  expand_idot  qq - 2*idot(a,b) + ww with idot's per-element
               bigint casts + coalesce (null-skip semantics the
               SRP path needs; dead weight here)
  expand_raw   qq - 2*aggregate(zip_with(a,b,(x,y)->x*y)) + ww —
               null-PROPAGATING like l2sq, no casts
  expand_seq   qq - 2*aggregate(sequence(0,63),acc+get(a,i)*get(b,i))
               + ww — single HOF, no intermediate array
  l2sq_seq     aggregate(sequence(0,63), acc+(get(a,i)-get(b,i))^2)
               — single HOF, no self-dots needed

All five produce identical int64 values on null-free input; the tool
checks the global sums match. Usage:
    python tools/ivf_fold_micro.py [corpus_dir] [n_cent] [repeats]
Prints one JSON line; informs which shape _d2_pair ships, recorded in
IVF_KERNEL_AB.json's final re-run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.functions import similarity as sim  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402

DIM = 64


def _raw_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )


def _seq_dot(a, b):
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + F.get(a, i) * F.get(b, i),
    )


def _seq_l2(a, b):
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + (F.get(a, i) - F.get(b, i)) * (F.get(a, i) - F.get(b, i)),
    )


KERNELS = {
    "l2sq_fold": lambda qa, wa, qq, ww: sim.l2sq(qa, wa),
    "expand_idot": lambda qa, wa, qq, ww: qq - 2 * sim.idot(qa, wa) + ww,
    "expand_raw": lambda qa, wa, qq, ww: qq - 2 * _raw_dot(qa, wa) + ww,
    "expand_seq": lambda qa, wa, qq, ww: qq - 2 * _seq_dot(qa, wa) + ww,
    "l2sq_seq": lambda qa, wa, qq, ww: _seq_l2(qa, wa),
}


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cosmoz_scale_x1000"
    n_cent = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = build_session(app_name="ivf-fold-micro")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{corpus}/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    qa = F.array(*[F.floor(v.getItem(i) * 1000).cast("bigint") for i in range(DIM)])
    qv = (
        e.select("vec_id", qa.alias("qa"))
        .withColumn("qq", _raw_dot(F.col("qa"), F.col("qa")))
        .persist()
    )
    qv.count()
    cent = (
        qv.orderBy("vec_id")
        .limit(n_cent)
        .select(
            F.col("vec_id").alias("j"),
            F.col("qa").alias("wa"),
            F.col("qq").alias("ww"),
        )
    )
    out = {"metric": "ivf_fold_micro", "unit": "sec", "n_cent": n_cent,
           "corpus": corpus, "kernels": {}}
    sums = set()
    for _ in range(repeats):
        for name, kern in KERNELS.items():
            t0 = time.time()
            row = (
                qv.crossJoin(F.broadcast(cent))
                .select(kern(F.col("qa"), F.col("wa"), F.col("qq"), F.col("ww")).alias("d2"))
                .agg(F.sum(F.col("d2") % 1000003).alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()[0]
            )
            dt = time.time() - t0
            out["kernels"].setdefault(name, []).append(round(dt, 3))
            sums.add((row["s"], row["c"]))
            print(f"{name:12s} {dt:8.2f}s sum={row['s']} n={row['c']}", flush=True)
    if len(sums) != 1:
        raise RuntimeError(f"kernels disagree: {sums}")
    out["best"] = {k: min(v) for k, v in out["kernels"].items()}
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
