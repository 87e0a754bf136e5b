"""Interleaved A/B for the SimHash and decontamination per-doc
kernels (plans/catalog_ext.SIMHASH_SIG_KERNEL / DECON_GRAM_KERNEL):
both queries currently shuffle every exploded token row (344 M at
x1000) — SimHash into a doc-keyed 64-sum aggregate, decontamination
through a lead-window + collect_set — and the MinHash sibling of the
same shape won at every scale (MINHASH_KERNEL_AB.json). Times each
query cold, end-to-end, fold vs kernel, alternating per repeat;
output cell-hash compared across variants, raises on any difference
(identity also pinned by tests/test_tokenstats_kernels.py).

Usage: python tools/tokenstats_kernel_ab.py [dir:mult ...]
                                            [--repeats N]
  default corpora: sf0.1, x100 and x1000.
Writes TOKENSTATS_KERNEL_AB.json at the repo root.
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
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/cosmoz_scale_x100", "x100"),
    ("/tmp/cosmoz_scale_x1000", "x1000"),
)

VARIANTS = (("fold", False), ("kernel", True))

QUERIES = {
    "x_dedup_simhash_pairs": (
        "SIMHASH_SIG_KERNEL",
        "xxhash64(doc_a, doc_b, hamming, hex_a, hex_b)",
    ),
    "x_decontaminate": (
        "DECON_GRAM_KERNEL",
        "xxhash64(train_doc, eval_doc, n_train_shingles, n_shared, "
        "overlap_frac, contaminated)",
    ),
}


def _one(spark, sf_dir: str, name: str, flag: str, kernel: bool):
    setattr(CE, flag, kernel)
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY[name].run(spark, sf_dir)
    sig = df.agg(
        F.expr(f"bit_xor({QUERIES[name][1]})").alias("s"),
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
    corpora = (
        [(a.rsplit(":", 1)[0], f"x{a.rsplit(':', 1)[1]}") for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = {flag: getattr(CE, flag) for flag, _ in QUERIES.values()}
    spark = build_session(
        app_name="tokenstats-kernel-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "tokenstats_kernel_ab",
        "unit": "sec",
        "repeats": repeats,
        "shipped_variants": {
            flag: ("kernel" if v else "fold") if v is not None else "auto"
            for flag, v in shipped.items()
        },
        "queries": {},
    }
    try:
        for name, (flag, _sig) in QUERIES.items():
            qrec = {}
            for d, label in corpora:
                rec = {key: {"t": []} for key, _ in VARIANTS}
                sigs_seen = set()
                for _ in range(repeats):
                    for key, kernel in VARIANTS:
                        dt, met, sig = _one(spark, d, name, flag, kernel)
                        rec[key]["t"].append(round(dt, 3))
                        sigs_seen.add(sig)
                        if round(dt, 3) == min(rec[key]["t"]):
                            rec[key]["run_bytes"] = met
                        print(
                            f"{name} {label:6s} {key:7s} {dt:8.2f}s sig={sig}",
                            flush=True,
                        )
                if len(sigs_seen) != 1:  # raise, not assert (python -O)
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
        for flag, v in shipped.items():
            setattr(CE, flag, v)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TOKENSTATS_KERNEL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
