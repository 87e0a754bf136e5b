"""Query plan catalogs. Importing this package populates REGISTRY
with every named (spark_fn, oracle_sql) query pair."""

from __future__ import annotations

from .registry import REGISTRY, Query, register

# import for registration side effects
from . import catalog_core  # noqa: E402,F401
from . import catalog_domain  # noqa: E402,F401
from . import catalog_ext  # noqa: E402,F401
from . import catalog_sources  # noqa: E402,F401
from . import catalog_streaming  # noqa: E402,F401

# The driver walks queries() in dict order under a budget: round 1
# recorded exactly the FIRST 50 of 56 registered queries and silently
# dropped the tail (j11, s04, st1/2/5/6 — see VERDICT.md). Order the
# registry so a truncated run still covers every §2 layer: the
# previously-dropped streaming/source queries first, then the flagship
# level pipeline, then everything else in registration order.
_FRONT = [
    "st5_stateful_validity",
    "st1_incremental_overwrite",
    "st6_stream_dedup_watermark",
    "st2_catchup_cursor",
    "j11_latest_asof_pick",
    "s04_typed_decimal_dimension",
    "level1",
    "level2",
    "level3",
    "level4",
    "level4_spec_mode",
]
_ordered = {n: REGISTRY[n] for n in _FRONT if n in REGISTRY}
_ordered.update({n: q for n, q in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "Query", "register"]
