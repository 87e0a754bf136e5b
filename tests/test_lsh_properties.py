"""Property-based guarantees behind the candidate-then-verify dedup
operators: the blocking schemes must NEVER miss the pairs they claim
to capture (capture is what makes exact-verify-on-candidates sound)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cosmoz_data_pipeline_spark.functions.similarity import srp_planes_for, srp_weight


@given(
    sig=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_simhash_pigeonhole_never_misses_hamming3(sig, flips):
    """Hamming distance <= 3 over a 64-bit signature guarantees at
    least one of the 4 16-bit bands is identical (4 bands, 3 flipped
    bits -> some band untouched) — the x_dedup_simhash_pairs blocking
    invariant."""
    other = sig
    for b in set(flips):
        other ^= 1 << b
    bands_a = [(sig >> (16 * k)) & 0xFFFF for k in range(4)]
    bands_b = [(other >> (16 * k)) & 0xFFFF for k in range(4)]
    assert any(a == b for a, b in zip(bands_a, bands_b))


@given(
    sig=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_simhash_wide_pigeonhole_never_misses_hamming3(sig, flips):
    """The round-8 WIDE blocking invariant (SIMHASH_WIDE_N corpora):
    <=3 flipped bits corrupt <=3 of the 8 8-bit blocks, so >=5 blocks
    stay intact and at least one of the C(8,5)=56 five-block combo
    keys matches exactly — the equi-join cannot miss a true pair."""
    from itertools import combinations

    other = sig
    for b in set(flips):
        other ^= 1 << b
    blk_a = [(sig >> (8 * k)) & 0xFF for k in range(8)]
    blk_b = [(other >> (8 * k)) & 0xFF for k in range(8)]
    assert any(
        all(blk_a[i] == blk_b[i] for i in combo)
        for combo in combinations(range(8), 5)
    )


@given(st.integers(min_value=1, max_value=10**13))
@settings(max_examples=200, deadline=None)
def test_srp_planes_bucket_occupancy_bound(n):
    """2^r always covers ceil(n/8) (expected occupancy stays ~8)
    unless the 30-plane clamp engages; r is monotone in n."""
    r = srp_planes_for(n)
    assert 8 <= r <= 30
    assert 2**r >= -(-n // 8) or r == 30
    assert srp_planes_for(n + 1) >= r


@given(
    plane=st.integers(min_value=0, max_value=255),
    i=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_srp_weights_centered_and_stable(plane, i):
    w = srp_weight(plane, i)
    assert -1_000_000 <= w <= 1_000_000
    assert w == srp_weight(plane, i)  # pure function of (plane, i)


def test_srp_weights_planes_are_not_shifts_of_each_other():
    """The round-3 fix regression guard: under the old LCG scheme,
    w(p2,i) - w(p1,i) was a CONSTANT across i (mod wraparound), so all
    planes voted identically and buckets collapsed. md5 weights must
    not exhibit that structure."""
    for p1, p2 in ((0, 1), (0, 8), (3, 11)):
        diffs = {srp_weight(p2, i) - srp_weight(p1, i) for i in range(1, 65)}
        assert len(diffs) > 32  # LCG gave |diffs| <= 2


@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=20
    ),
    dup_idx=st.integers(min_value=0, max_value=19),
)
@settings(max_examples=200, deadline=None)
def test_minhash_signature_ignores_duplicate_shingles(hashes, dup_idx):
    """MinHash is a SET signature: repeating a shingle (the Spark
    explode+lead path emits duplicates; the oracle list_distincts)
    cannot change any component — the invariant that lets the engine
    skip a distinct before the groupBy-min, and the reason J=1 exact
    copies always share every band key."""
    from cosmoz_data_pipeline_spark.functions.text import (
        MINHASH_A0,
        MINHASH_A_STEP,
        MINHASH_B0,
        MINHASH_B_STEP,
        MINHASH_P,
    )

    def sig(hs):
        return [
            min(
                ((MINHASH_A0 + MINHASH_A_STEP * i) * h + MINHASH_B0 + MINHASH_B_STEP * i)
                % MINHASH_P
                for h in hs
            )
            for i in range(12)
        ]

    duplicated = hashes + [hashes[dup_idx % len(hashes)]]
    assert sig(hashes) == sig(duplicated)


@given(
    lt=st.integers(min_value=0, max_value=10**9),
    delta=st.integers(min_value=1, max_value=1740),
    band=st.sampled_from([1740]),
)
@settings(max_examples=300, deadline=None)
def test_banded_range_join_two_bucket_probe_never_misses(lt, delta, band):
    """The interval-bucketing invariant behind banded_range_join (J7/
    J10): any right row with r in [l - W, l) lies in bucket floor(l/W)
    or floor(l/W) - 1, so the two-bucket probe provably captures every
    in-range pair and the exact predicate only ever FILTERS candidates.
    """
    rt = lt - delta  # in-range by construction: lt - W <= rt < lt
    lband = lt // band
    rband = rt // band
    assert rband in (lband - 1, lband)


def test_srp_fold_null_skips_ragged_vectors(spark):
    """ADVICE r6: a null element or a vector shorter than the plane
    width must contribute 0 to the projection (SQL-SUM null-skipping),
    not poison the whole dot to NULL; a null/empty vector folds to
    bucket 0 (what the oracle's generate_series CTEs emit for it).
    Expected buckets computed independently in plain Python over the
    same md5 weights with explicit null-skipping."""
    from cosmoz_data_pipeline_spark.functions.similarity import (
        SRP_QUANT,
        srp_band_buckets,
        srp_weight,
    )

    dim, planes = 8, 4
    vecs = {
        1: [0.1, -0.2, 0.3, -0.1, 0.25, -0.35, 0.05, 0.15],  # full
        2: [0.1, None, 0.3, -0.1, None, -0.35, 0.05, 0.15],  # null elems
        3: [0.1, -0.2, 0.3],                                 # short
        4: None,                                             # null vector
        5: [],                                               # empty
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, v array<double>"
    )
    got = {
        r["vec_id"]: r["bucket"]
        for r in srp_band_buckets(df, spark, 1, planes, dim).collect()
    }

    import math

    def expect(v):
        if not v:
            return 0
        q = [None if x is None else math.floor(x * SRP_QUANT) for x in v]
        b = 0
        for p in range(planes):
            s = sum(
                qi * srp_weight(p, i + 1)
                for i, qi in enumerate(q)
                if qi is not None
            )
            if s > 0:
                b |= 1 << p
        return b

    assert set(got) == set(vecs)
    for k, v in vecs.items():
        assert got[k] == expect(v), f"vec {k}: {got[k]} != {expect(v)}"
