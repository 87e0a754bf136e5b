"""Quantized-verify vs true-float-cosine semantics for
x_embed_cosine_neardup (ADVICE r7 #3).

The round-7 verify join carries floor(v*1e6) int32 vectors and scores
candidates with an exact integer dot (sim.idot); the docstring claims
the resulting pair set is IDENTICAL to the true float cosine's because
no candidate sits within ~0.08 of the 0.9 threshold. Until now that
was prose. This test recomputes the TRUE float cosine (sim.cosine over
the original double vectors, unquantized, unrounded) for every
candidate pair the query's own blocking produces, and asserts

1. the registry query's pair set == the float-cosine >= 0.9 pair set
   (same blocking, so any difference is quantization/rounding drift);
2. the measured minimum |cosine - 0.9| margin over ALL candidates is
   orders of magnitude above the quantization error (~1e-6 per
   component on a unit-norm vector), so the equality is robust, not
   lucky.

Runs at sf0.01 — the smallest SF whose corpus carries the injected
near-duplicate pairs (sf0.001's candidate set produces no >= 0.9
pairs, which would make the set equality vacuous).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from cosmoz_data_pipeline_spark.functions import similarity as sim
from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists
from cosmoz_data_pipeline_spark.plans.catalog_ext import _emb_aug, _neardup_cands

SF01 = "/root/testdata/sf0.01"
THRESHOLD = 0.9
# conservative ceiling on the cosine error the 1e-6 grid can introduce
# (per-component error < 1e-6 against ~unit-norm vectors, 64 dims)
QUANT_ERR_CEIL = 1e-3


def test_quantized_pair_set_equals_float_cosine_pair_set(spark):
    try:
        q_pairs = {
            (r.vec_a, r.vec_b)
            for r in REGISTRY["x_embed_cosine_neardup"].run(spark, SF01).collect()
        }
        _, cand = _neardup_cands(spark, SF01)
        emb = _emb_aug(spark, SF01).select(
            "vec_id", "v"
        ).withColumn("nrm", sim.norm(F.col("v")))
        ea = emb.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        eb = emb.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        scored = (
            cand.join(ea, "vec_a")
            .join(eb, "vec_b")
            .select(
                "vec_a",
                "vec_b",
                sim.cosine(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ).alias("cos"),
            )
        )
        rows = scored.collect()
    finally:
        release_persists()

    assert rows, "blocking produced no candidates — corpus mismatch?"
    f_pairs = {(r.vec_a, r.vec_b) for r in rows if r.cos >= THRESHOLD}
    assert f_pairs, "no float-cosine pairs >= 0.9 — set equality would be vacuous"
    assert q_pairs == f_pairs, (
        f"quantized verify drifted from true float cosine: "
        f"quantized-only={sorted(q_pairs - f_pairs)[:5]} "
        f"float-only={sorted(f_pairs - q_pairs)[:5]}"
    )

    margin = min(abs(r.cos - THRESHOLD) for r in rows)
    assert margin > QUANT_ERR_CEIL, (
        f"measured min |cosine-0.9| margin {margin:.2e} is within the "
        f"quantization error ceiling {QUANT_ERR_CEIL:.0e} — a future "
        f"corpus this close to the threshold could flip pairs; revisit "
        f"the int32 grid or the threshold rounding"
    )
