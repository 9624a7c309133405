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
from . import graphiter  # noqa: E402,F401
from . import spans  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import corpusstats  # noqa: E402,F401

# The driver's correctness gate verifies the FIRST 50 registry entries in
# insertion order.  Front-load whatever has not yet been driver-verified —
# plus anything modified this round — so every query earns a green
# CORRECTNESS row across rounds.
#
# Rotation ledger (round 3 window below; update each round):
# - after this window, every query green in r1 (old 0-49) or r2
#   (CORRECTNESS_r02: 50/50 pass) that is NOT re-listed here has been
#   unmodified since its green;
# - r3 window = 13 never-checked (added after the r2 window froze)
#   + 3 dedup queries modified after their r1 green (two-md5 minhash)
#   + q_approx_distinct_sketch (failed r1, rewritten to a
#   hash-matchable contract this round) + 2 modified this round
#   (q_events_hourly HLL contract, q_dedup_ngram_jaccard de-skewed
#   df-cap) + everything newly added in round 3.
_VERIFY_FIRST = [
    # Never driver-checked (added after the r2 window froze).
    "q_unpivot_melt",
    "q_bm25_topk",
    "q_array_hof_zoo",
    "q_gapfill_locf",
    "q_stream_stateful_dedup",
    "q_pagerank_steps",
    "q_substring_spans",
    "q_decontaminate",
    "q_grouping_sets_lattice",
    "q_histogram_acctbal",
    "q_funnel_conversion",
    "q_cohort_retention",
    "q_profile_table",
    # Modified after their r1 green (stale driver signal).
    "q_dedup_minhash_lsh",
    "q_dedup_cluster_survivors",
    "q_dedup_lsh_capped",
    # Failed r1 as rows-only; rewritten to a hash-matchable contract.
    "q_approx_distinct_sketch",
    # Modified in round 3.
    "q_events_hourly",
    "q_dedup_ngram_jaccard",
    # New in round 3 (appended below as they are added).
    "q_quantile_sketch",
    "q_corpus_entropy_kl",
    "q_zscore_anomaly",
    "q_tfidf_cosine_pairs",
    "q_bigram_lm",
    "q_countmin_heavy_hitters",
    "q_weighted_sample_es",
    "q_stream_dedup_watermark",
    "q_markov_transitions",
    "q_stream_chained_daily",
    "q_kmeans_assign",
    "q_fuzzy_name_match",
    "q_snapshot_diff",
    "q_stream_upsert_cache",
    "q_trending_rank_delta",
    "q_cusum_changepoint",
    "q_stratified_k_sample",
    "q_rolling_7day",
    "q_percentile_bands",
    "q_hll_merge_rollup",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _VERIFY_FIRST if n in QUERIES}
    for n, q in QUERIES.items():
        if n not in ordered:
            ordered[n] = q
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "QueryDef", "register"]
