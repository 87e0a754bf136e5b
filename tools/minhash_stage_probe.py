"""Stage attribution for x_dedup_minhash_lsh / x_dedup_ngram_jaccard
— the most expensive x1000 queries once the SRP kernel retired the
neardup projection (SCALE_r10.json: ngram 93.6 s, minhash 85.1 s at
x1000). Times COLD PREFIXES of the shared shingle→signature pipeline
(persists released, memos cleared between prefixes), so stage costs
are prefix DIFFERENCES:

  docs     — augmented documents scan (originals + exact + near
             copies)
  shingles — + tokenize, posexplode, lead-window word-3-grams
  sigs     — + shingle md5 + 12 affine min-aggregates (the MinHash
             signature table, one doc_id-keyed shuffle)
  cands    — + 4x3 banding + band-key self-join + distinct
  minhash  — x_dedup_minhash_lsh end-to-end (signature-agreement
             verify join on top of cands)
  ngram    — x_dedup_ngram_jaccard end-to-end (exact token-set
             Jaccard on the banded candidates — its extra cost over
             'cands' is the set-intersection verify)

Prefix differences over-attribute shared fused-scan work to the
earlier stage (same caveat as NEARDUP_STAGES.json); the end-to-end
times in the same session are the comparators.

Usage: python tools/minhash_stage_probe.py [dir:mult ...]
  default corpora: x100 and x1000.
Writes MINHASH_STAGES.json at the repo root.
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
from cosmoz_data_pipeline_spark.plans.registry import (  # noqa: E402
    release_persists,
    scoped_persist,
)
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_bench import _cold, _metrics_since, _stage_hwm  # noqa: E402

DEFAULT_CORPORA = (
    ("/tmp/cosmoz_scale_x100", 100),
    ("/tmp/cosmoz_scale_x1000", 1000),
)


def _timed(spark, rec: dict, key: str, fn):
    _cold(spark)
    hwm = _stage_hwm(spark)
    t0 = time.time()
    rows = fn()
    dt = time.time() - t0
    rec[key] = {
        "t": round(dt, 3),
        "rows": rows,
        "run_bytes": _metrics_since(spark, hwm),
    }
    release_persists()
    _cold(spark)
    print(f"    {key:10s} {dt:8.2f}s rows={rows}", flush=True)
    return rows


def probe_once(spark, sf_dir: str) -> dict:
    rec: dict = {}

    def sigs_df():
        sh = CE._shingle_rows(CE._docs_aug(spark, sf_dir))
        mins = (
            sh.select("doc_id", CE._shingle_h().alias("h"))
            .groupBy("doc_id")
            .agg(*CE._minhash_aggs())
        )
        return scoped_persist(
            mins.select(
                "doc_id",
                F.array(*[f"m{i}" for i in range(CE.MINHASH_K)]).alias("sig"),
            )
        )

    _timed(spark, rec, "docs", lambda: CE._docs_aug(spark, sf_dir).count())
    _timed(
        spark,
        rec,
        "shingles",
        lambda: CE._shingle_rows(CE._docs_aug(spark, sf_dir)).count(),
    )
    _timed(spark, rec, "sigs", lambda: sigs_df().count())
    _timed(
        spark,
        rec,
        "cands",
        lambda: CE._minhash_band_cands(sigs_df()).count(),
    )
    for key, qname in (
        ("minhash", "x_dedup_minhash_lsh"),
        ("ngram", "x_dedup_ngram_jaccard"),
    ):
        _timed(
            spark,
            rec,
            key,
            lambda qname=qname: REGISTRY[qname].run(spark, sf_dir).count(),
        )
    return rec


def main() -> None:
    args = sys.argv[1:]
    corpora = (
        [(a.rsplit(":", 1)[0], int(a.rsplit(":", 1)[1])) for a in args]
        if args
        else list(DEFAULT_CORPORA)
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = build_session(
        app_name="minhash-stage-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "minhash_stage_probe",
        "unit": "sec",
        "policy": "cold prefixes (persists released, memos cleared per "
        "prefix); stage cost = prefix difference, over-attributing fused "
        "scan work to earlier stages; the end-to-end times in the same "
        "session are the comparators",
        "corpora": {},
    }
    for d, mult in corpora:
        print(f"x{mult}:", flush=True)
        out["corpora"][f"x{mult}"] = probe_once(spark, d)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MINHASH_STAGES.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
