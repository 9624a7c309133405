"""Query workload registry — the engine's declared operator inventory.

Every operator family from SURVEY.md §2 (scans, filters, joins, aggs,
windows, sorts/set-ops, string/date functions, graph-pattern queries)
plus the large-scale training-data operators (dedup, similarity
search, text analysis, sessionization) is demonstrated here as a
(PySpark query, DuckDB oracle SQL) pair over the driver's parquet
tables.  ``__spark_entry__.py`` re-exports this registry.
"""

from __future__ import annotations

from .registry import BENCH_ONLY, QUERIES, QueryDef, register  # noqa: F401

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
from . import fixtures  # noqa: E402,F401
from . import spans  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import corpusstats  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401

# The driver's correctness gate verifies the FIRST 50 registry entries in
# insertion order.  Front-load whatever changed this round; the rest of
# the window auto-fills with the LONGEST-UNVERIFIED queries (see
# _reorder) so every query re-earns a driver row every ~3 rounds.
#
# Rotation ledger — MECHANICALLY ENFORCED since round 6: tools/ledger.py
# hashes every registered query's semantics (oracle SQL + docstring-
# stripped AST of the query fn and its transitive omim_spark-internal
# helper closure) against tests/ledger_manifest.json, and
# tests/test_ledger.py FAILS if a changed/new query is missing from
# this list.  Since round 7 the manifest also carries each query's
# last driver-green round ("green"), and _reorder sorts the
# non-windowed remainder by ascending green — age rotation is
# mechanical too, not curated.  The manifest is regenerated
# (python tools/ledger.py update --round N) at end of round, after the
# window is final — the driver then verifies exactly that code, making
# the manifest the next round's "last driver-green" baseline.
#
# Round-13 window:
# - entering round 13 the cumulative state is: CORRECTNESS_r12 50/50
#   green; all 193 registered queries driver-green AND hash-matchable
#   with code AST-identical since their green (ledger-enforced);
#   green histogram {r8: 9, r9: 45, r10: 45, r11: 44, r12: 50}.
# - 20 slots below (2 new gates + 18 changed-closure rides); the ~30
#   fill slots take all nine r8 greens (the r12 verdict drain target:
#   q02/q07/q08/q09/q11/q19/q20/q21/q22) plus the oldest r9s.
_VERIFY_FIRST = [
    # NEW in round 13 (r12 advice, medium): fuzzy decontamination no
    # longer silently LOSES fully-capped train docs (every band bucket
    # hot — >cap near-identical copies of a leaked passage).  Those
    # docs now route to a direct shingle-overlap fallback against the
    # broadcast bench shingles (strictly better recall than banding),
    # and the output's new via_fallback column makes the routing
    # auditable.  The capfire fixture now pins the FIRE path both
    # ways: fd1-fd3 report via_fallback=true (recall recovered),
    # at-cap fd4/fd5 report via_fallback=false (strict > pinned —
    # a >= regression flips their flag and hash-mismatches).
    "q_decontaminate_fuzzy",
    "q_decontaminate_fuzzy_capfire",
    # NEW in round 13 (r12 verdict #8): the hot-SHINGLE cap (MAX_DF)
    # gets the same cap-firing oracle fixture the band cap got in r12
    # — an at-cap pair survives (strict >), a fully-hot pair vanishes,
    # and one pair's Jaccard crosses 0.8 ONLY because the cap reaches
    # the verification tier too (shared lsh_capped_pairs core +
    # _lsh_capped_oracle builder, so gate and fixture can never
    # drift).
    "q_dedup_lsh_capfire",
    # CHANGED in round 13 (r12 verdict #2): the shared workload/
    # capability cores' lineage cuts (LSH funnel shingle/candidate
    # tables, fuzzy-decon band table, recall metrics, incremental
    # dedup, crossmodal near-dup, perplexity LM build) now route
    # through operators/checkpoint.cut_lineage like their operators/
    # siblings — plans byte-identical in 'local' mode; plus the
    # narrowed Connect-probe except in cut_lineage itself (r12
    # advice) rides into every consumer's closure.
    "q_dedup_lsh_capped",
    "q_dedup_minhash_lsh",
    "q_dedup_incremental",
    "q_dedup_cluster_histogram",
    "q_dedup_cluster_survivors",
    "q_lsh_recall",
    "q_lsh_recall_sampled",
    "q_crossmodal_neardup",
    "q_perplexity_filter",
    "q_ann_ivf_stored",
    # CHANGED in round 13: cut_lineage closure rides only (the
    # narrowed except; no workload-side edits).
    "q_decontaminate",
    "q_label_propagation",
    "q_pagerank_steps",
    "q_substring_dup_stats",
    "q_substring_clean_corpus",
    "q_substring_dup_by_source",
    "q_substring_excise",
    # CHANGED in round 13, optimization pass (OPTIMIZATION_r13.md):
    # scale-adaptive scan spreading (registry.spread — repartition
    # after single-row-group scans, a no-op on any layout that
    # already parallelizes) on q01/q03/sessionize and the two dedup
    # funnels, plus the jaccard funnel's cut_lineage'd shingle tables
    # (explode-once, mirroring the LSH funnel).  Results verified
    # hash-identical at sf0.001/0.01/0.1 against the oracle.
    "q01_pricing_summary",
    "q03_top_orders",
    "q_dedup_ngram_jaccard",
    "q_sessionize",
]

# Queries that must sit PAST the driver's first-50 window: rows-only
# by design (no DuckDB-expressible oracle), so a slot spent on them
# records nothing.  EMPTY since round 10: the one permanent rows-only
# row (q_events_hourly_hll, raw HLL sketch output) moved to
# registry.BENCH_ONLY — every registered query is now hash-matchable.
_VERIFY_LAST: list[str] = []


def _manifest_raw() -> dict:
    import json
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent.parent
        / "tests"
        / "ledger_manifest.json"
    )
    if not path.exists():
        return {}
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _last_green_rounds() -> dict[str, int]:
    """Each query's last driver-green round from the rotation-ledger
    manifest (tests/ledger_manifest.json).  Unknown/new queries map to
    0 so they sort first among the fill.  Missing manifest → empty
    (fill degrades to registration order)."""
    return {
        n: (v.get("green", 0) if isinstance(v, dict) else 0)
        for n, v in _manifest_raw().items()
        if not n.startswith("_")
    }


def _stamped_window() -> list[str]:
    """The persisted end-of-round window from the manifest's _meta —
    valid ONLY while _VERIFY_FIRST is exactly the list it was stamped
    under (the committed state the driver verifies).  Stamping
    green=N moves the window's queries to the END of a staleness
    sort, so without replaying the stored window the driver would
    verify a different 50 than the manifest claims green for.  The
    moment the next round's builder touches _VERIFY_FIRST, this
    returns [] and the fill reverts to longest-unverified-first."""
    meta = _manifest_raw().get("_meta", {})
    if meta.get("verify_first") == list(_VERIFY_FIRST):
        return [n for n in meta.get("window", []) if n in QUERIES]
    return []


def _reorder() -> None:
    # A typo or a renamed query must fail loudly — silently dropping a
    # _VERIFY_FIRST entry would shrink the driver-verified window.
    missing = [
        n for n in _VERIFY_FIRST + _VERIFY_LAST if n not in QUERIES
    ]
    if missing:
        raise AssertionError(
            f"_VERIFY_FIRST/_VERIFY_LAST names not in QUERIES: {missing}"
        )
    ordered = {n: QUERIES[n] for n in _VERIFY_FIRST}
    for n in _stamped_window():
        if n not in ordered and n not in _VERIFY_LAST:
            ordered[n] = QUERIES[n]
    # Age rotation (mechanical since r7): the window slots after
    # _VERIFY_FIRST go to the LONGEST-UNVERIFIED queries — ascending
    # last-green round from the ledger manifest, registration order as
    # the tiebreak so the fill stays deterministic.
    green = _last_green_rounds()
    reg_pos = {n: i for i, n in enumerate(QUERIES)}
    rest = [
        n for n in QUERIES if n not in ordered and n not in _VERIFY_LAST
    ]
    for n in sorted(rest, key=lambda n: (green.get(n, 0), reg_pos[n])):
        ordered[n] = QUERIES[n]
    for n in _VERIFY_LAST:
        ordered[n] = QUERIES[n]
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["BENCH_ONLY", "QUERIES", "QueryDef", "register"]
