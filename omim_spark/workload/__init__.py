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
# Round-11 window:
# - entering round 11 the cumulative state is: CORRECTNESS_r10 50/50
#   green; all 182 registered queries driver-green AND hash-matchable
#   with code AST-identical since their green (ledger-enforced);
#   green histogram {r7: 37, r8: 47, r9: 48, r10: 50}.
# - _VERIFY_FIRST stays MINIMAL: the four queries round 11's fixes
#   touch — q_omim_entry_classes (r10 ADVICE high: the
#   zero-replacement-obsolete fall-through, reference main.py:276-287
#   — emit_entry_classes now suppresses label/synonyms only for
#   REPLACED obsoletes, and the fixture/oracle gained the 600100
#   label+synonym rows, 68→70) and the three multimodal queries whose
#   helper closure includes decode_png (the r10 VERDICT defect: a
#   corrupt IHDR chunk-length now raises ValueError, not
#   struct.error) — plus the eight NEW r11 gates, the two TZ-fixed
#   queries, and the four span queries riding the checkpoint perf fix.
#   The 32 fill slots take 32 of the 34 remaining r7-greens — after
#   r11 exactly TWO driver-green rows predate r8 (q_stream_curation,
#   q_substring_spans; first in line for the r12 fill).
_VERIFY_FIRST = [
    # CHANGED in round 11 (r10 ADVICE high): G6 per-entry class
    # emission — an OBSOLETE entry with ZERO replacements falls
    # through per the reference and keeps rdfs:label +
    # hasExactSynonym; only replaced obsoletes are suppressed.
    "q_omim_entry_classes",
    # CHANGED in round 11 (r10 VERDICT defect): decode_png gained the
    # IHDR body-length gate (struct.error → ValueError on corrupt
    # chunk-length); these three ride the closure through
    # operators/multimodal.py.
    "q_multimodal_frames",
    "q_multimodal_features",
    "q_multimodal_resize",
    # NEW in round 11: fuzzy benchmark decontamination — MinHash-
    # banded candidates vs the held-out suite, true-Jaccard verified
    # (the near-dup companion to q_decontaminate's exact-8-gram tier).
    "q_decontaminate_fuzzy",
    # NEW in round 11: its online tier — a REAL stream-static
    # broadcast join (the one Structured Streaming pattern the other
    # nine stream gates don't exercise): streaming train docs banded
    # row-locally against the static benchmark band table.
    "q_stream_decontaminate",
    # CHANGED in round 11: TZ hardening, found by the r11
    # TZ=America/New_York full-registry sweep (both drifted on a
    # non-UTC host while the driver's UTC box masked it) —
    # q_events_sliding_window's ORACLE used TO_TIMESTAMP
    # (TIMESTAMPTZ: STRFTIME renders in the SYSTEM zone; fixed with
    # plain MAKE_TIMESTAMP), and q_latest_per_key returned a raw
    # TimestampType, which PySpark row collection localizes to the
    # SYSTEM zone regardless of the session pin (fixed by rendering
    # JVM-side with date_format under the UTC session).
    "q_events_sliding_window",
    "q_latest_per_key",
    # NEW in round 11: S9's line rendering promoted from builder-only
    # to driver-gated — ttl_lines is a pure projection, so the oracle
    # rebuilds every byte (escape chain order, ^^ datatypes, bnode
    # detection/rendering, rdf:type-first ordering, distinct).
    "q_omim_ttl_lines",
    # NEW in round 11: two more builder-only surfaces promoted via
    # the scratch-file pattern — the S2/S3/F1 comment-aware reader +
    # mimTitles parser through a REAL file scan, and the S10/S11/S13
    # report sinks' exact bytes (ROBOT subheader, RFC-4180 quoting).
    "q_omim_reader_parse",
    "q_omim_report_sinks",
    # NEW in round 11: S4 typed cache scan + F10 HGNC gate skip-path
    # through real header-TSV scans, and T13 CURIE↔URI rewrites with
    # longest-prefix-first recovery and roundtrip identity.
    "q_omim_typed_cache_scan",
    "q_omim_uri_curie_roundtrip",
    # NEW in round 11: S15/S16 export transforms (SSSOM flatten,
    # obographs nodes/edges incl. restriction collapse) — the last
    # oracle-expressible builder-only surfaces; S7/S8 stay pytest
    # (driver-side network protocols behind injected transports).
    "q_omim_artifact_exports",
    # CHANGED in round 11 (perf): merged/excise span operators now
    # checkpoint the narrow (id, pos, h) span table so the dominant
    # tokenize+explode runs ONCE per funnel instead of per consumer —
    # interleaved A/B at sf0.1: 1.27 s vs 1.84 s min-of-6 on the
    # dup-stats headline.
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
