"""Interleaved A/B for the ngram hash-set verify screen
(plans/catalog_ext.NGRAM_HASH_VERIFY): times x_dedup_ngram_jaccard
cold, end-to-end, with the direct array<string> shingle-set verify
join against the int64-hash screen + string-confirm shape in ONE
session, alternating variants per repeat.

Motivation (VERDICT r11 next #1): the exact-verify join ships KB-scale
string shingle sets both ways for EVERY candidate pair — the dominant
shuffle volume of the most expensive x1000 query (102.5 s,
SCALE_r11.json). The screen ships 8-byte gram hashes instead and
only survivors (≈ output pairs) touch strings. Output identity —
including under forced hash collisions — is pinned by
tests/test_ngram_hash_verify.py and re-checked here via a full output
cell-hash per run (raises on any difference).

Usage: python tools/ngram_hash_ab.py [dir:label ...] [--repeats N]
  default corpora: sf0.1 (gate calibration), x100 and x1000.
Writes NGRAM_HASH_AB.json at the repo root.
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

QUERY = "x_dedup_ngram_jaccard"
SIG = "xxhash64(doc_a, doc_b, jaccard)"
VARIANTS = (("strings", False), ("hash_screen", True))


def _one(spark, sf_dir: str, on: bool):
    CE.NGRAM_HASH_VERIFY = on
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY[QUERY].run(spark, sf_dir)
    sig = df.agg(
        F.expr(f"bit_xor({SIG})").alias("s"), F.count(F.lit(1)).alias("c")
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
    shipped = CE.NGRAM_HASH_VERIFY
    spark = build_session(
        app_name="ngram-hash-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "ngram_hash_verify_ab",
        "unit": "sec",
        "repeats": repeats,
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "shipped_variant": "auto (None = corpus-gated, screen at >= "
        f"{CE.MINHASH_KERNEL_MIN_N} augmented docs)"
        if shipped is None
        else ("hash_screen" if shipped else "strings"),
        "corpora": {},
    }
    try:
        for d, label in corpora:
            snt = sentinel_sec(spark, repeats=2)
            print(f"{label:6s} sentinel {snt:.2f}s", flush=True)
            rec = {key: {"t": []} for key, _ in VARIANTS}
            rec["sentinel_sec"] = snt
            sigs_seen = set()
            for _ in range(repeats):
                for key, on in VARIANTS:
                    dt, met, sig = _one(spark, d, on)
                    rec[key]["t"].append(round(dt, 3))
                    sigs_seen.add(sig)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    print(
                        f"{QUERY} {label:6s} {key:12s} {dt:8.2f}s sig={sig}",
                        flush=True,
                    )
            if len(sigs_seen) != 1:  # raise, not assert (python -O)
                raise RuntimeError(
                    f"{QUERY}@{label}: variants disagree on output "
                    f"cell-hash: {sigs_seen}"
                )
            rec["output_sig"] = list(sigs_seen.pop())
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_strings_over_hash_screen"] = round(
                rec["strings"]["best"] / rec["hash_screen"]["best"], 3
            )
            out["corpora"][label] = rec
    finally:
        CE.NGRAM_HASH_VERIFY = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NGRAM_HASH_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
