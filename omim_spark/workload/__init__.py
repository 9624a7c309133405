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
# Round-12 window:
# - entering round 12 the cumulative state is: CORRECTNESS_r11 50/50
#   green; all 190 registered queries driver-green AND hash-matchable
#   with code AST-identical since their green (ledger-enforced);
#   green histogram {r7: 2, r8: 46, r9: 45, r10: 47, r11: 50}.
# - _VERIFY_FIRST stays MINIMAL so the fill drains the 2 remaining
#   r7 greens (q_stream_curation, q_substring_spans — the r11 verdict
#   drain target) plus the oldest r8 rows.
_VERIFY_FIRST = [
    # NEW in round 12: the API-entry JSON path promoted from
    # builder-only to driver-gated (the last oracle-expressible
    # composed surface, r11 VERDICT #1) — scratch landed-JSON
    # envelope → read_entry_json multiLine scan → the api_entries
    # transforms (core/pubmed/mapped-ids/phenotypic-series,
    # reference omim_entry_parser.py:62-160,386-422) and the
    # gene-association enrichment report (reference
    # extract_omim_information.py:24-125).
    "q_omim_api_entry_parse",
    "q_omim_gene_assoc_report",
    # CHANGED in round 12 (r11 verdict #5): q_decontaminate_fuzzy
    # gained the hot-band bucket cap (train-side (band, sig) buckets
    # with > CONTAM_MAX_BAND_DF docs dropped before the bench join,
    # replayed in the oracle with HAVING + NOT EXISTS) — bounds the
    # candidate population a boilerplate-heavy corpus otherwise
    # inflates super-linearly.
    "q_decontaminate_fuzzy",
    # NEW in round 12 (self-review): the production cap never fires
    # at driver SFs, so this fixture gate makes it fire under the
    # oracle — identical-text train docs blow a bucket past the cap
    # and vanish despite Jaccard 1.0, while an at-cap pair survives
    # (pins strict >, the train-only census, the anti-join direction).
    "q_decontaminate_fuzzy_capfire",
    # CHANGED in round 12 (r11 verdict #6 / advice): production
    # operators' lineage cuts (span funnels, CC/label-prop/pagerank,
    # exact decontamination, SSSOM rows, pipeline build) now route
    # through operators/checkpoint.cut_lineage — localCheckpoint by
    # default, spark.omim.checkpoint.mode=reliable for clusters where
    # executor loss must recompute instead of failing.  These ride
    # the closure change; plans are byte-identical in 'local' mode.
    "q_decontaminate",
    "q_dedup_cluster_histogram",
    "q_dedup_cluster_survivors",
    "q_label_propagation",
    "q_pagerank_steps",
    "q_substring_dup_stats",
    "q_substring_clean_corpus",
    "q_substring_dup_by_source",
    "q_substring_excise",
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
