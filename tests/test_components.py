"""Property test for x_dedup_components: the fixed-iteration min-label
propagation must agree with ground-truth union-find connected
components computed in plain Python over the same pair list.

CC_ITERS is chosen >= the pair-graph diameter of the injected near-dup
clusters; this test is the guard that the assumption actually holds on
the corpus (if a longer chain ever appears, labels stop matching and
this fails before the oracle gate does).
"""
from __future__ import annotations

from cosmoz_data_pipeline_spark.plans.catalog_ext import (
    q_dedup_components,
    q_dedup_simhash_pairs,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the canonical min id
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def test_label_propagation_matches_union_find(spark, sf_dir):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_simhash_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    ]
    assert pairs, "fixture must contain at least one near-dup pair"
    truth = _union_find(pairs)

    got = {
        r["doc_id"]: (r["component"], r["component_size"])
        for r in q_dedup_components(spark, sf_dir).collect()
    }
    # same node set: every doc in a pair, nothing else
    assert set(got) == set(truth)
    # labels converged to the true component min id
    for doc, root in truth.items():
        assert got[doc][0] == root, f"doc {doc}: {got[doc][0]} != {root}"
    # sizes consistent with the truth partition
    from collections import Counter

    sizes = Counter(truth.values())
    for doc, (comp, size) in got.items():
        assert size == sizes[comp]
    spark.catalog.clearCache()
