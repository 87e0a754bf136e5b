"""Query plan catalogs. Importing this package populates REGISTRY
with every named (spark_fn, oracle_sql) query pair."""

from __future__ import annotations

from .registry import REGISTRY, Query, register, release_persists, scoped_persist

# import for registration side effects
from . import catalog_core  # noqa: E402,F401
from . import catalog_domain  # noqa: E402,F401
from . import catalog_ext  # noqa: E402,F401
from . import catalog_sources  # noqa: E402,F401
from . import catalog_streaming  # noqa: E402,F401

# The driver walks queries() in dict order under a 50-row budget: it
# records exactly the first 50 registered queries and silently drops
# any tail. Round 3 consolidated the registry to EXACTLY 50 (natural
# merges: s03+s06, s04+s05, simhash→simhash_pairs, ivf_assign→
# ivf_topk, multimodal decode+frames, langid+quality) so the artifact
# captures 100% — DRIVER_QUERY_BUDGET guards the invariant; if a new
# query pushes past it, merge, pin it into _TAIL, or the excess names
# print at import so any coverage loss is explicit, never silent.
# Order still front-loads the streaming/source layer so a truncated
# run covers every §2 layer.
#
# _TAIL (round 5): the IVF train/search bench-split queries sit PAST
# the driver budget by design — they are instrumentation views of
# x_ann_ivf_topk (which IS recorded): _train returns the centroid
# table the recorded query trains, _search returns the recorded
# query's exact output. Round 7 adds the ppm codec view of
# x_multimodal_decode_frames (also recorded, via its stub default) —
# same media plumbing, REAL P6 parse, own strict oracle. Dropping
# them from the driver record loses no operator coverage; their
# oracle parity is still enforced locally by tools/check_all.py and
# tests/test_oracle_parity.py, and bench.py times the full registry
# including them.
DRIVER_QUERY_BUDGET = 50
_FRONT = [
    "st5_stateful_validity",
    "st1_incremental_overwrite",
    "st6_stream_dedup_watermark",
    "st2_catchup_cursor",
    "j11_latest_asof_pick",
    "s04_s05_station_dim_parse",
    "level1",
    "level2",
    "level3",
    "level4",
    "level4_spec_mode",
]
_TAIL = [
    "x_ann_ivf_topk_train",
    "x_ann_ivf_topk_search",
    "x_multimodal_decode_ppm",
    # round 14: the storage-backed level1 reshape — same oracle as the
    # recorded `level1` (which stays the driver-attested entry); this
    # view pins the scan-local physical shape to strict oracle parity
    "level1_scan_local",
    # round 15: the full level1→level4 chain over the sink with the
    # scan-local prefix (LEVEL4_SCANLOCAL_AB adoption) — same oracle
    # as the recorded `level4`
    "level4_scan_local",
]
_ordered = {n: REGISTRY[n] for n in _FRONT if n in REGISTRY}
_ordered.update(
    {n: q for n, q in REGISTRY.items() if n not in _ordered and n not in _TAIL}
)
_ordered.update({n: REGISTRY[n] for n in _TAIL if n in REGISTRY})
REGISTRY.clear()
REGISTRY.update(_ordered)

if len(REGISTRY) > DRIVER_QUERY_BUDGET + len(_TAIL):  # pragma: no cover
    _dropped = list(REGISTRY)[DRIVER_QUERY_BUDGET:]
    import sys

    print(
        f"WARNING: {len(REGISTRY)} queries registered but the driver "
        f"records only {DRIVER_QUERY_BUDGET}; UNRECORDED tail: {_dropped}",
        file=sys.stderr,
    )

__all__ = ["REGISTRY", "Query", "register", "release_persists", "scoped_persist"]
