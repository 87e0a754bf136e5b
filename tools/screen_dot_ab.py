"""Interleaved A/B for the prescreen head-dot implementation
(plans/catalog_ext.NEARDUP_SCREEN_DOT): with the SRP projection
kernel shipped, the head-16 pre-verify screen is
x_embed_cosine_neardup's dominant stage (51.4 s of 82.3 s at x1000,
NEARDUP_STAGES.json), and its per-candidate dot is sim.idot — a
Cast + Coalesce interpreter node per element per candidate over the
139 M-row screen join. Variants (identical integer sums, pair set
pinned by tests/test_neardup_prescreen.py):

  fold     — int32 heads + sim.idot (round-9 shape)
  raw      — bigint null-coalesced heads (built once per vector) +
             the pure multiply-add fold (sim.idot_raw)
  unrolled — same bigint heads + an explicit h-term codegen
             expression (sim.idot_unrolled) — the round-5
             fold-vs-unrolled trade at head width

Times the full cold query per variant in ONE session, alternating
variants per repeat; compares a full output cell-hash across variants
and raises on any difference.

Usage: python tools/screen_dot_ab.py [dir:mult ...] [--repeats N]
  default corpora: x100 and x1000.
Writes SCREEN_DOT_AB.json at the repo root.
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

VARIANTS = ("fold", "raw", "unrolled")


def _one(spark, sf_dir: str, variant: str):
    CE.NEARDUP_SCREEN_DOT = variant
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    df = REGISTRY["x_embed_cosine_neardup"].run(spark, sf_dir)
    sig = df.agg(
        F.expr("bit_xor(xxhash64(vec_a, vec_b, cosine))").alias("s"),
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
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    shipped = CE.NEARDUP_SCREEN_DOT
    spark = build_session(
        app_name="screen-dot-ab", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "screen_dot_ab",
        "unit": "sec",
        "repeats": repeats,
        "query": "x_embed_cosine_neardup (cold, end-to-end)",
        "shipped_variant": shipped,
        "corpora": {},
    }
    try:
        for d, mult in corpora:
            rec = {v: {"t": []} for v in VARIANTS}
            sigs_seen = set()
            for _ in range(repeats):
                for v in VARIANTS:
                    dt, met, sig = _one(spark, d, v)
                    rec[v]["t"].append(round(dt, 3))
                    sigs_seen.add(sig)
                    if round(dt, 3) == min(rec[v]["t"]):
                        rec[v]["run_bytes"] = met
                    print(f"x{mult:<5d} {v:9s} {dt:8.2f}s sig={sig}", flush=True)
            if len(sigs_seen) != 1:  # raise, not assert (python -O)
                raise RuntimeError(
                    f"variants disagree on output cell-hash: {sigs_seen}"
                )
            rec["output_sig"] = list(sigs_seen.pop())
            for v in VARIANTS:
                rec[v]["best"] = min(rec[v]["t"])
            best = min(VARIANTS, key=lambda v: rec[v]["best"])
            rec["winner"] = best
            rec["speedup_fold_over_winner"] = round(
                rec["fold"]["best"] / rec[best]["best"], 3
            )
            out["corpora"][f"x{mult}"] = rec
    finally:
        CE.NEARDUP_SCREEN_DOT = shipped
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCREEN_DOT_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
