"""Query workload registry — the engine's declared operator inventory.

Every operator family from SURVEY.md §2 (scans, filters, joins, aggs,
windows, sorts/set-ops, string/date functions, graph-pattern queries)
plus the large-scale training-data operators (dedup, similarity
search, text analysis, sessionization) is demonstrated here as a
(PySpark query, DuckDB oracle SQL) pair over the driver's parquet
tables.  ``__spark_entry__.py`` re-exports this registry.
"""

from __future__ import annotations

from .registry import QUERIES, QueryDef, register  # noqa: F401

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import eventops  # noqa: E402,F401
from . import omimlike  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import pipelineops  # noqa: E402,F401
from . import streamgate  # noqa: E402,F401

__all__ = ["QUERIES", "QueryDef", "register"]
