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

__all__ = ["REGISTRY", "Query", "register"]
