"""Interleaved A/B for the per-doc MinHash signature kernel
(plans/catalog_ext.MINHASH_SIG_KERNEL): times x_dedup_minhash_lsh and
x_dedup_ngram_jaccard cold, end-to-end, with the explode → lead-window
→ min-aggregate signature build against the scan-local per-doc Python
kernel in ONE session, alternating variants per repeat.

Motivation: MINHASH_STAGES.json localizes ~70 s of minhash's 84.9 s
x1000 wall to the signature build (344 M exploded token rows through
a doc-keyed window shuffle), re-paid by ngram_jaccard's exact verify.
The kernel computes signatures (and the ngram shingle set) without
any explode or shuffle; variant identity is pinned by
tests/test_minhash_kernel.py and re-checked here via a full output
cell-hash per run (raises on any difference).

Usage: python tools/minhash_kernel_ab.py [dir:mult ...] [--repeats N]
  default corpora: sf0.1 (gate calibration), x100 and x1000.
Writes MINHASH_KERNEL_AB.json at the repo root.
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

SIG_COLS = {
    "x_dedup_minhash_lsh": "xxhash64(doc_a, doc_b, est_jaccard)",
    "x_dedup_ngram_jaccard": "xxhash64(doc_a, doc_b, jaccard)",
}


def _one(spark, sf_dir: str, name: str, kernel: bool):
    CE.MINHASH_SIG_KERNEL = kernel
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
    corpora = (
        [(a.rsplit(":", 1)[0], f"x{a.rsplit(':', 1)[1]}") for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = CE.MINHASH_SIG_KERNEL
    spark = build_session(
        app_name="minhash-kernel-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "minhash_kernel_ab",
        "unit": "sec",
        "repeats": repeats,
        "shipped_variant": "auto (None = corpus-gated, kernel at >= "
        f"{CE.MINHASH_KERNEL_MIN_N} augmented docs)"
        if shipped is None
        else ("kernel" if shipped else "fold"),
        "queries": {},
    }
    try:
        for name in SIG_COLS:
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
        CE.MINHASH_SIG_KERNEL = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MINHASH_KERNEL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
