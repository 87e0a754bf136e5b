"""One-time pin of the I/O-sentinel checksum + reference seconds
(cosmoz_data_pipeline_spark/sentinel.py). Computes the bit_xor
checksum of the frozen workload and the min-of-3 seconds on this
host, then patches the two module constants in place. Run ONCE at
adoption; re-running must reproduce the identical checksum (the
workload is deterministic) and only refreshes the printed seconds for
manual inspection — it never rewrites an already-pinned checksum.

Usage: python tools/pin_io_sentinel.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cosmoz_data_pipeline_spark import sentinel as S  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(app_name="pin-io-sentinel")
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    xor = None
    for _ in range(3):
        t0 = time.time()
        b = (
            spark.range(S.IO_SENTINEL_ROWS)
            .select(F.xxhash64("id").alias("h"))
            .repartition(S.IO_SENTINEL_PARTS, "h")
            .agg(F.expr("bit_xor(h)"))
            .collect()[0][0]
        )
        times.append(time.time() - t0)
        if xor is not None and b != xor:
            raise AssertionError(f"nondeterministic checksum: {xor} vs {b}")
        xor = b
    ref = round(min(times), 3)
    print(f"io-sentinel xor={xor} min-of-3={ref}s times={[round(t,2) for t in times]}")
    if S._IO_XOR is not None:
        if S._IO_XOR != xor:
            raise AssertionError(
                f"pinned {S._IO_XOR} != computed {xor}: definition drifted"
            )
        print("checksum already pinned and reproduced; nothing rewritten")
        return
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cosmoz_data_pipeline_spark",
        "sentinel.py",
    )
    with open(path) as f:
        src = f.read()
    # match whatever value/comment currently follows the assignment so
    # a re-pin after adoption still rewrites it (ADVICE r13: the old
    # literal patterns only matched the pre-adoption placeholders, so a
    # re-pin would silently leave the source unchanged)
    src, n_xor = re.subn(
        r"_IO_XOR: int \| None = .*",
        f"_IO_XOR: int | None = {xor}  # pinned (tools/pin_io_sentinel.py)",
        src,
    )
    src, n_ref = re.subn(
        r"IO_SENTINEL_REF_SEC: float \| None = .*",
        f"IO_SENTINEL_REF_SEC: float | None = {ref}  # pinned at adoption",
        src,
    )
    if n_xor != 1 or n_ref != 1:
        raise SystemExit(
            f"pin failed: matched _IO_XOR {n_xor}x, IO_SENTINEL_REF_SEC "
            f"{n_ref}x in {path} (expected exactly 1 each) — source drifted"
        )
    with open(path, "w") as f:
        f.write(src)
    print(f"pinned into {path}")
    spark.stop()


if __name__ == "__main__":
    main()
