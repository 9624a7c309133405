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
# Round-14 window (optimization round 2 of 2; OPTIMIZATION_r14.md):
# - entering round 14: CORRECTNESS_r13 50/50 green; every registered
#   query driver-green with code AST-identical since its green
#   (ledger-enforced); green histogram {r10: 45, r11: 44, r12: 55,
#   r13: 50}.
# - 13 changed-closure slots below; the 37 fill slots rotate to the
#   longest-unverified queries (the r10 greens) mechanically.
_VERIFY_FIRST = [
    # CHANGED in round 14: the five consumers of the fused
    # triple-emission legs (triples.py: emit_entry_classes 11-leg →
    # 1-explode, emit_restriction_with_evidence 3 → 1,
    # emit_gene_disease_associations 2×3 → 2×1; multiset-identical by
    # construction — WHEN gates replace leg filters, per-element
    # synonym+axiom batches replace per-leg explodes).  Golden TTL
    # byte-identical; oracle hash-match at sf0.001.
    "q_omim_axiom_synonyms",
    "q_omim_entry_classes",
    "q_omim_gene_disease_bidi",
    "q_omim_restriction_emission",
    "q_omim_ttl_lines",
    # CHANGED in round 14: PQ-ADC scoring rewrite (spread scan,
    # zero-allocation index-walking aggregate, query-constant distance
    # table precomputed on the broadcast codebook side — bit-identical
    # doubles, same left-to-right reduction order) and the all-pairs
    # cosine tier (per-vector norms hoisted out of the pair loop,
    # spread streamed side, pinned broadcast build side).  Oracle
    # hash-match at sf0.001/0.01/0.1.
    "q_ann_pq_adc",
    "q_embedding_neardup",
    # CHANGED in round 14, closure rides only: registry.scan_units
    # gained the remote-path no-op guard + fingerprinted layout cache
    # (r13 ADVICE medium/low) — every spread() user's hash moves; the
    # query plans at probe-able local paths are byte-identical.
    "q01_pricing_summary",
    "q03_top_orders",
    "q_dedup_lsh_capped",
    "q_dedup_ngram_jaccard",
    "q_sessionize",
    "q_substring_dup_stats",
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
