"""Cluster-heavy documents corpus for the ngram hash-verify A/B's
identified win window (VERDICT r12 task 6 / NGRAM_HASH_AB.json's
measured-out note: "pair amplification >> audit volume").

The scale-corpus generator produces near-INDEPENDENT docs, so banded
candidates are overwhelmingly true near-dups (99.2 % verify) and a
hash screen can never save work. This corpus builds the opposite
shape: 5 % of base docs carry 40 near-copies each — half light edits
(~10 % token replacement, Jaccard ~0.8: candidates that VERIFY), half
heavy edits (~35 % replacement, Jaccard ~0.5: pairs that band-collide
often but FAIL the 0.6 exact verify — the rows where shipping 8-byte
gram hashes instead of KB-scale string sets could pay). ~300 k docs,
~4 M intra-cluster pair slots.

Same Spark-side md5-PRNG codegen style as tools/scale_corpus.py —
no driver loops, bit-reproducible.

Usage: python tools/cluster_corpus.py [OUT_DIR]
  default OUT_DIR: /tmp/cosmoz_cluster300k
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_corpus import LANGS, _h  # noqa: E402

N_BASE = 100_000
CLUSTER_EVERY = 20  # base_id % 20 == 0 -> clustered
COPIES = 40
VOCAB = 2_400  # Heaps-ish for ~300k docs (scale_corpus anchor)


def gen(spark, out_dir: str) -> None:
    # (base_id, copy_no) grid: copy_no 0 = the base document itself;
    # only every CLUSTER_EVERY-th base gets copies 1..COPIES
    base = spark.range(N_BASE).select(F.col("id").alias("base_id"))
    copies = base.where(F.col("base_id") % CLUSTER_EVERY == 0).select(
        "base_id",
        F.explode(F.sequence(F.lit(1), F.lit(COPIES))).alias("copy_no"),
    )
    rows = base.select("base_id", F.lit(0).alias("copy_no")).unionByName(copies)

    n_toks = (_h("clen", F.col("base_id")) % 91 + 10).cast("int")
    # heavy-edit copies (even copy_no) replace ~35 % of tokens,
    # light-edit copies (odd) ~10 %; the base replaces none
    repl_pct = (
        F.when(F.col("copy_no") == 0, F.lit(0))
        .when(F.col("copy_no") % 2 == 0, F.lit(35))
        .otherwise(F.lit(10))
    )
    toks = F.transform(
        F.sequence(F.lit(1), n_toks),
        lambda i: F.when(
            _h("crepl", F.col("base_id"), F.col("copy_no"), i) % 100
            < repl_pct,
            # replacement tokens come from a disjoint vocab range so an
            # edit always changes the shingle set
            F.concat(
                F.lit("r"),
                (
                    _h("cuniq", F.col("base_id"), F.col("copy_no"), i) % VOCAB
                ).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("w"),
                (_h("ctok", F.col("base_id"), i) % VOCAB).cast("string"),
            )
        ),
    )
    text = F.concat_ws(" ", toks)
    docs = rows.select(
        (F.col("base_id") * (COPIES + 1) + F.col("copy_no")).alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]),
            (_h("clang", F.col("base_id")) % 5 + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"), (_h("csrc", F.col("base_id")) % 20).cast("string")
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    print(f"wrote {out_dir}/documents.parquet", flush=True)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cosmoz_cluster300k"
    spark = build_session(app_name="cluster-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    gen(spark, out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
