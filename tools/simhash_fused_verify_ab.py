"""Interleaved A/B for the fused SimHash verify
(plans/catalog_ext.SIMHASH_FUSED_VERIFY): the shipped r12 shape runs
band self-join -> distinct on UNVERIFIED candidates -> two joins back
to the signature table -> exact Hamming filter; the fused shape
carries the four 16-bit signature words through the band rows so the
verify runs map-side right after the self-join and the distinct sees
only verified pairs (893 k vs 25.3 M rows at x1000). Trade measured
here: a wider band-row exchange (129 M rows x +4 ints, both join
sides) against dropping one 25.3 M-row distinct plus two
candidate<->sigs shuffles.

Times x_dedup_simhash_pairs cold end-to-end, joined vs fused,
alternating per repeat in ONE session; output cell-hash compared
across variants, raises on any difference. Sentinels per the r12
protocol; x1000 gets io brackets + the r13 window classifier.

Usage: python tools/simhash_fused_verify_ab.py [dir:label ...]
                                               [--repeats N]
  default corpora: sf0.1, x100 and x1000.
Writes SIMHASH_FUSED_AB.json at the repo root.
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
from cosmoz_data_pipeline_spark.sentinel import (  # noqa: E402
    SENTINEL_REF_SEC,
    io_sentinel_sec,
    io_window,
    sentinel_sec,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/cosmoz_scale_x100", "x100"),
    ("/tmp/cosmoz_scale_x1000", "x1000"),
)

VARIANTS = (("joined", False), ("fused", True))
QUERY = "x_dedup_simhash_pairs"
SIG = "xxhash64(doc_a, doc_b, hamming, hex_a, hex_b)"


def _one(spark, sf_dir: str, fused: bool):
    CE.SIMHASH_FUSED_VERIFY = fused
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY[QUERY].run(spark, sf_dir)
    sig = df.agg(
        F.expr(f"bit_xor({SIG})").alias("s"),
        F.count(F.lit(1)).alias("c"),
    ).collect()[0]
    dt = time.time() - t0
    met = _metrics_since(spark, hwm)
    release_persists()
    _cold(spark)
    return dt, met, (sig["s"], sig["c"])


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    corpora = (
        [(a.rsplit(":", 1)[0], a.rsplit(":", 1)[1]) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = CE.SIMHASH_FUSED_VERIFY
    spark = build_session(
        app_name="simhash-fused-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # absorb JVM/codegen startup before the first sentinel capture
    spark.range(10_000_000).agg(F.sum("id")).collect()
    out = {
        "metric": "simhash_fused_verify_ab",
        "unit": "sec",
        "repeats": repeats,
        "shipped_variant": (
            "auto" if shipped is None else ("fused" if shipped else "joined")
        ),
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    try:
        for d, label in corpora:
            snt = sentinel_sec(spark, repeats=2)
            io_pre = io_sentinel_sec(spark) if label == "x1000" else None
            rec = {key: {"t": []} for key, _ in VARIANTS}
            sigs_seen = set()
            for _ in range(repeats):
                for key, fused in VARIANTS:
                    dt, met, sig = _one(spark, d, fused)
                    rec[key]["t"].append(round(dt, 3))
                    sigs_seen.add(sig)
                    if round(dt, 3) == min(rec[key]["t"]):
                        rec[key]["run_bytes"] = met
                    print(
                        f"{label:6s} {key:7s} {dt:8.2f}s sig={sig}",
                        flush=True,
                    )
            if len(sigs_seen) != 1:  # raise, not assert (python -O)
                raise RuntimeError(
                    f"{label}: variants disagree on output cell-hash: "
                    f"{sigs_seen}"
                )
            rec["output_sig"] = list(sigs_seen.pop())
            rec["sentinel_sec"] = snt
            if io_pre is not None:
                io_post = io_sentinel_sec(spark)
                rec["io_sentinel_pre_sec"] = io_pre
                rec["io_sentinel_post_sec"] = io_post
                rec["io_window"] = io_window(io_pre, io_post)
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
                rec[key]["best_normalized"] = round(
                    rec[key]["best"] * SENTINEL_REF_SEC / snt, 3
                )
            rec["speedup_joined_over_fused"] = round(
                rec["joined"]["best"] / rec["fused"]["best"], 3
            )
            out["corpora"][label] = rec
    finally:
        CE.SIMHASH_FUSED_VERIFY = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SIMHASH_FUSED_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
