"""Interleaved A/B for the components lazy-tail checkpoint
(plans/catalog_ext.COMPONENTS_LAZY_TAIL_CKPT): eager full-label-table
localCheckpoint every superstep (round-11 shape) against lazy
checkpoints on skip-probe rounds, which fuse each small-frontier tail
superstep into the next probed round's job.

COMPONENTS_STAGES.json motivates the shape: at sf0.1 the fix-point
runs 11 supersteps whose tail frontiers are 29/3/2/3 rows yet each
paid a full-table eager checkpoint + job launch (~0.27 s apiece, ~3 s
of the ~7-11 s query); at x100/x1000 the loop converges in 2 probed
supersteps and the flag never engages (the at-scale cost is the
simhash-pairs prefix, 92.5 of 99.5 s at x1000 — not the loop).
Labels identity across both shapes is pinned by
tests/test_components.py; re-checked here per run via output
cell-hash.

Usage: python tools/components_tail_ab.py [dir:label ...] [--repeats N]
Writes COMPONENTS_TAIL_AB.json at the repo root.
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
from tools.scale_bench import _cold  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.001", "sf0.001"),
    ("/root/testdata/sf0.1", "sf0.1"),
)

QUERY = "x_dedup_components"
SIG = "xxhash64(doc_id, component, component_size)"
VARIANTS = (("eager", False), ("lazy_tail", True))


def _one(spark, sf_dir: str, lazy: bool):
    CE.COMPONENTS_LAZY_TAIL_CKPT = lazy
    _cold(spark)
    t0 = time.time()
    df = REGISTRY[QUERY].run(spark, sf_dir)
    sig = df.agg(
        F.expr(f"bit_xor({SIG})").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    dt = time.time() - t0
    release_persists()
    _cold(spark)
    return dt, (sig["s"], sig["c"])


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    corpora = (
        [tuple(a.rsplit(":", 1)) for a in args] if args else list(DEFAULT_CORPORA)
    )
    shipped = CE.COMPONENTS_LAZY_TAIL_CKPT
    spark = build_session(app_name="components-tail-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "components_lazy_tail_ckpt_ab",
        "unit": "sec",
        "repeats": repeats,
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "shipped_variant": "lazy_tail" if shipped else "eager",
        "corpora": {},
    }
    try:
        for d, label in corpora:
            snt = sentinel_sec(spark, repeats=2)
            rec = {key: {"t": []} for key, _ in VARIANTS}
            rec["sentinel_sec"] = snt
            sigs_seen = set()
            for _ in range(repeats):
                for key, lazy in VARIANTS:
                    dt, sig = _one(spark, d, lazy)
                    rec[key]["t"].append(round(dt, 3))
                    sigs_seen.add(sig)
                    print(f"{QUERY} {label:8s} {key:9s} {dt:7.2f}s sig={sig}", flush=True)
            if len(sigs_seen) != 1:  # raise, not assert (python -O)
                raise RuntimeError(
                    f"{QUERY}@{label}: variants disagree on output "
                    f"cell-hash: {sigs_seen}"
                )
            rec["output_sig"] = list(sigs_seen.pop())
            for key, _ in VARIANTS:
                rec[key]["best"] = min(rec[key]["t"])
            rec["speedup_eager_over_lazy"] = round(
                rec["eager"]["best"] / rec["lazy_tail"]["best"], 3
            )
            out["corpora"][label] = rec
    finally:
        CE.COMPONENTS_LAZY_TAIL_CKPT = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COMPONENTS_TAIL_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
