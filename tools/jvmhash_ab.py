"""Interleaved A/B for WHERE the per-doc kernels hash their shingles
(plans/catalog_ext.MINHASH_HASH_WHERE / DECON_HASH_WHERE): per-shingle
Python hashlib.md5 inside the Arrow batch loop (the round-11 adopted
shape, flagged by VERDICT r11 as the one 100 TB throughput ceiling
resting on Python) against the round-12 split — kernel emits distinct
shingle strings, md5 prefix + affine minima run JVM-side as
whole-stage-codegen array expressions.

Times x_dedup_minhash_lsh and x_dedup_ngram_jaccard (MINHASH flag) and
x_decontaminate (DECON flag, kernel FORCED on at every scale so the
hash location is the only variable) cold, end-to-end, alternating
variants per repeat in one session. Output identity is pinned by
tests/test_minhash_kernel.py / test_tokenstats_kernels.py and
re-checked here via a full output cell-hash per run.

Usage: python tools/jvmhash_ab.py [dir:label ...] [--repeats N]
Writes JVMHASH_AB.json at the repo root.
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
from cosmoz_data_pipeline_spark.sentinel import SENTINEL_REF_SEC, sentinel_sec  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/cosmoz_scale_x100", "x100"),
    ("/tmp/cosmoz_scale_x1000", "x1000"),
)

SIG_COLS = {
    "x_dedup_minhash_lsh": "xxhash64(doc_a, doc_b, est_jaccard)",
    "x_dedup_ngram_jaccard": "xxhash64(doc_a, doc_b, jaccard)",
    "x_decontaminate": "xxhash64(train_doc, eval_doc, n_shared, overlap_frac)",
}
VARIANTS = ("python", "jvm")


def _set_where(name: str, where: str) -> None:
    if name == "x_decontaminate":
        CE.DECON_HASH_WHERE = where
    else:
        CE.MINHASH_HASH_WHERE = where


def _one(spark, sf_dir: str, name: str, where: str):
    _set_where(name, where)
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
        [tuple(a.rsplit(":", 1)) for a in args] if args else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = (CE.MINHASH_HASH_WHERE, CE.DECON_HASH_WHERE, CE.DECON_GRAM_KERNEL)
    spark = build_session(
        app_name="jvmhash-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "kernel_hash_location_ab",
        "unit": "sec",
        "repeats": repeats,
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "shipped": {"minhash": shipped[0], "decon": shipped[1]},
        "queries": {},
    }
    try:
        CE.DECON_GRAM_KERNEL = True  # hash location is the only variable
        for name in SIG_COLS:
            qrec = {}
            for d, label in corpora:
                snt = sentinel_sec(spark, repeats=2)
                rec = {key: {"t": []} for key in VARIANTS}
                rec["sentinel_sec"] = snt
                sigs_seen = set()
                for _ in range(repeats):
                    for key in VARIANTS:
                        dt, met, sig = _one(spark, d, name, key)
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
                for key in VARIANTS:
                    rec[key]["best"] = min(rec[key]["t"])
                rec["speedup_python_over_jvm"] = round(
                    rec["python"]["best"] / rec["jvm"]["best"], 3
                )
                qrec[label] = rec
            out["queries"][name] = qrec
    finally:
        CE.MINHASH_HASH_WHERE, CE.DECON_HASH_WHERE, CE.DECON_GRAM_KERNEL = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "JVMHASH_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
