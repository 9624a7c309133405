"""Reusable large-scale operators: deduplication, similarity search,
text analysis, multimodal column processing.

These are the production-shaped APIs behind the workload queries in
``omim_spark.workload`` — parameterized, composable DataFrame→DataFrame
transforms designed for 1000-executor / 100 TB deployments (see each
module's scale notes)."""

from omim_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    profile,
    similarity,
    text,
)
