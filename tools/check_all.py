"""Run every registered query against its DuckDB oracle (the driver's
correctness gate, locally). Usage:

    python tools/check_all.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from cosmoz_data_pipeline_spark.plans import REGISTRY, release_persists  # noqa: E402
from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402
from tools.compare import compare, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = build_session()
    con = duckdb_connection(sf_dir)
    failures = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            df = q.run(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                status, msg = n >= 0, f"rows-only n={n}"
            else:
                status, msg = compare(df, q.oracle, con)
        except Exception:
            status, msg = False, traceback.format_exc(limit=8)
        failures += not status
        # No clearCache: every query's persisted intermediates are
        # scope-tracked and released here, exactly as a long-lived
        # session would do after each terminal action.
        release_persists()
        print(f"{'PASS' if status else 'FAIL'} {name:32s} {time.time()-t0:6.1f}s {msg}")
    # Leak gate: after releasing, the SQL cache manager must be empty —
    # a persist that bypassed scoped_persist() shows up here.
    if not spark._jsparkSession.sharedState().cacheManager().isEmpty():
        print("LEAK: cacheManager not empty after release_persists()")
        failures += 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
