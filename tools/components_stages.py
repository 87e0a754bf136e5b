"""Per-superstep stage probe for x_dedup_components (round 12,
VERDICT r11 next #2): the query is checkpoint-bound at x1000 (88.5 s,
SCALE_r11.json) and the round-12 question is where superstep wall
goes — the neighbor-min join + full-label checkpoint write, or the
driver probe — and how it tracks frontier size, so the two candidate
reshapes (two-hop propagation, lazy small-frontier checkpoints) can
be judged on evidence.

Runs the registry query cold with catalog_ext.COMPONENTS_TRACE armed;
the trace records per superstep the checkpoint-materialization wall,
the probe wall, and the probed changed-count (None on skip-probe
rounds — the probe-cadence halving). prefix_sec is everything before
the first superstep (simhash pairs, edge build, label init).

Usage: python tools/components_stages.py [dir:label ...] [--repeats N]
Writes COMPONENTS_STAGES.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmoz_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from cosmoz_data_pipeline_spark.plans import catalog_ext as CE  # noqa: E402
from cosmoz_data_pipeline_spark.plans.registry import release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.sentinel import SENTINEL_REF_SEC, sentinel_sec  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold  # noqa: E402

DEFAULT_CORPORA = (
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/cosmoz_scale_x100", "x100"),
    ("/tmp/cosmoz_scale_x1000", "x1000"),
)

QUERY = "x_dedup_components"


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
    spark = build_session(app_name="components-stages")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "components_superstep_stages",
        "unit": "sec",
        "repeats": repeats,
        "sentinel_ref_sec": SENTINEL_REF_SEC,
        "corpora": {},
    }
    for d, label in corpora:
        snt = sentinel_sec(spark, repeats=2)
        best = None
        for _ in range(repeats):
            _cold(spark)
            CE.COMPONENTS_TRACE = trace = []
            t0 = time.time()
            n = REGISTRY[QUERY].run(spark, d).count()
            total = time.time() - t0
            CE.COMPONENTS_TRACE = None
            release_persists()
            _cold(spark)
            step_sec = sum(s["ckpt_sec"] + s["probe_sec"] for s in trace)
            rec = {
                "total_sec": round(total, 3),
                "prefix_sec": round(total - step_sec, 3),
                "supersteps": trace,
                "n_supersteps": len(trace),
                "rows": n,
            }
            print(
                f"{label:6s} total {total:7.2f}s prefix "
                f"{rec['prefix_sec']:7.2f}s steps {len(trace)} "
                + " ".join(
                    f"[{s['ckpt_sec']}+{s['probe_sec']} chg={s['changed']}]"
                    for s in trace
                ),
                flush=True,
            )
            if best is None or total < best["total_sec"]:
                best = rec
        best["sentinel_sec"] = snt
        best["total_normalized"] = round(
            best["total_sec"] * SENTINEL_REF_SEC / snt, 2
        )
        out["corpora"][label] = best
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COMPONENTS_STAGES.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
