"""Drift sentinel (round 12, VERDICT r11 wrong #1 / missing #2).

Host drift between measurement sessions reached 1.3-1.5x on untouched
queries in rounds 10-11, which made raw cross-round BENCH/SCALE totals
uninterpretable without re-running the old commit interleaved. The
sentinel normalizes every artifact AT CAPTURE TIME instead: a fixed,
data-independent workload is timed (min-of-N, same policy as the
queries) in every BENCH/SCALE capture session, and each artifact
records both its raw timings and the session's sentinel seconds. A
reader comparing two artifacts divides by the sentinel ratio; a
sentinel near SENTINEL_REF_SEC means the session ran on a
reference-speed host.

THE SENTINEL DEFINITION IS FROZEN. It must never be optimized, resized
or re-expressed — its only value is being identical in every capture
forever. It deliberately exercises the two subsystems host drift hits:

- cpu leg: 400M-row range -> xxhash64 -> 1024-key partial-agg
  (whole-stage codegen throughput; shuffle is KBs after map-side
  combine)
- shuffle leg: 60M-row range -> xxhash64 -> row-level repartition(64)
  -> agg (writes/reads ~480 MB of shuffle blocks through the local
  disks / page cache)

Both legs fold to a deterministic bit_xor checksum (order-independent,
overflow-free under ANSI), asserted on every run so a wrong result can
never masquerade as a fast one.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# frozen workload — see module docstring; DO NOT TUNE
SENTINEL_CPU_ROWS = 400_000_000
SENTINEL_SHUFFLE_ROWS = 60_000_000
SENTINEL_SHUFFLE_PARTS = 64
_CPU_XOR = -3304989052006467209
_SHUF_XOR = -7754586918589064044

# reference-host seconds: the min-of-3 measured on the round-12
# capture host at adoption time. Normalized artifact columns are
# raw_sec * (SENTINEL_REF_SEC / session_sentinel_sec) — i.e. "what
# this would have read on the reference host".
SENTINEL_REF_SEC = 3.12


def sentinel_once(spark: SparkSession) -> float:
    """One timed sentinel pass; asserts both checksums."""
    t0 = time.time()
    a = (
        spark.range(SENTINEL_CPU_ROWS)
        .select(F.xxhash64("id").alias("h"))
        .groupBy(F.pmod(F.col("h"), F.lit(1024)).alias("k"))
        .agg(F.expr("bit_xor(h)").alias("x"))
        .agg(F.expr("bit_xor(x)"))
        .collect()[0][0]
    )
    b = (
        spark.range(SENTINEL_SHUFFLE_ROWS)
        .select(F.xxhash64("id").alias("h"))
        .repartition(SENTINEL_SHUFFLE_PARTS, "h")
        .agg(F.expr("bit_xor(h)"))
        .collect()[0][0]
    )
    dt = time.time() - t0
    if a != _CPU_XOR or b != _SHUF_XOR:
        raise AssertionError(
            f"sentinel checksum mismatch: cpu={a} shuffle={b} — the "
            "sentinel definition has drifted; its timings are void"
        )
    return dt


def sentinel_sec(spark: SparkSession, repeats: int = 3) -> float:
    """Min-of-``repeats`` sentinel seconds — the session's host-speed
    token, recorded verbatim in every BENCH/SCALE artifact."""
    return round(min(sentinel_once(spark) for _ in range(repeats)), 3)
