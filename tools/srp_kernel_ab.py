"""Interleaved A/B for the SRP projection kernel
(functions/similarity.SRP_KERNEL): times the two SRP consumers —
x_embed_cosine_neardup (cold, end-to-end) and x_ann_lsh_buckets —
with the in-row HOF projection fold against the Arrow/numpy matmul
kernel in ONE session, alternating variants per repeat so host drift
cancels.

Motivation: the round-10 stage probe (NEARDUP_STAGES.json) localized
117.6 s of x_embed_cosine_neardup's 171.2 s x1000 wall (69 %) to the
bands stage — bands*r*dim interpreted multiply-adds per vector
against the broadcast plane bank, the same interpreted-fold floor the
IVF assignment kernel retired for a 3.23x win in round 10
(IVF_ASSIGN_AB.json). The variants are bit-identical (float64 integer
matmul below the 2^53 envelope, exact int64 matmul fallback beyond —
pinned by tests/test_srp_kernel.py); the tool additionally compares a
full output cell-hash across variants and raises on any difference.

Usage: python tools/srp_kernel_ab.py [dir:mult ...] [--repeats N]
                                     [--neardup-only]
  default corpora: sf0.1 (the bench SF — calibrates the
  SRP_KERNEL_MIN_N gate), x100 and x1000.
Writes SRP_KERNEL_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.functions import similarity as sim  # noqa: E402
from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans.registry import release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/cosmoz_scale_x100", "x100"),
    ("/tmp/cosmoz_scale_x1000", "x1000"),
)

VARIANTS = (("fold", False), ("kernel", True))

# order-insensitive cell hash per query (bit_xor of per-row xxhash64)
SIG_COLS = {
    "x_embed_cosine_neardup": "xxhash64(vec_a, vec_b, cosine)",
    "x_ann_lsh_buckets": "xxhash64(vec_id, bucket, bucket_size)",
}


def _one(spark, sf_dir: str, name: str, kernel: bool):
    sim.SRP_KERNEL = kernel
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY[name].run(spark, sf_dir)
    sig = df.agg(
        F.expr(f"bit_xor({SIG_COLS[name]})").alias("s"),
        F.count(F.lit(1)).alias("c"),
    ).collect()[0]
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    release_persists()
    _cold(spark)
    return dt, met, (sig["s"], sig["c"])


def main() -> None:
    args = sys.argv[1:]
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    queries = list(SIG_COLS)
    if "--neardup-only" in args:
        queries = ["x_embed_cosine_neardup"]
        args.remove("--neardup-only")
    corpora = (
        [(a.rsplit(":", 1)[0], f"x{a.rsplit(':', 1)[1]}") for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = sim.SRP_KERNEL
    spark = build_session(
        app_name="srp-kernel-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "srp_kernel_ab",
        "unit": "sec",
        "repeats": repeats,
        "shipped_variant": "auto (None = corpus-gated on row count, "
        f"kernel at n >= {sim.SRP_KERNEL_MIN_N})"
        if shipped is None
        else ("kernel" if shipped else "fold"),
        "queries": {},
    }
    try:
        for name in queries:
            qrec = {}
            for d, label in corpora:
                rec = {key: {"t": []} for key, _ in VARIANTS}
                sigs_seen = set()
                for _ in range(repeats):
                    for key, kernel in VARIANTS:
                        dt, met, sig = _one(spark, d, name, kernel)
                        rec[key]["t"].append(round(dt, 3))
                        sigs_seen.add(sig)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"{name} {label:6s} {key:7s} {dt:8.2f}s "
                            f"sig={sig}",
                            flush=True,
                        )
                if len(sigs_seen) != 1:  # raise, not assert: asserts
                    # vanish under python -O and this is the
                    # measurement path's only equivalence guard
                    raise RuntimeError(
                        f"{name}@{label}: variants disagree on output "
                        f"cell-hash: {sigs_seen}"
                    )
                rec["output_sig"] = list(sigs_seen.pop())
                for key, _ in VARIANTS:
                    rec[key]["best"] = min(rec[key]["t"])
                rec["speedup_fold_over_kernel"] = round(
                    rec["fold"]["best"] / rec["kernel"]["best"], 3
                )
                qrec[label] = rec
            out["queries"][name] = qrec
    finally:
        sim.SRP_KERNEL = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SRP_KERNEL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
