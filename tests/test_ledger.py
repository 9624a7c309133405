"""Mechanical rotation-ledger enforcement (tools/ledger.py).

The repo's cumulative correctness invariant is: every registered query
has a driver-green CORRECTNESS row under its CURRENT code.  These
tests make the invariant impossible to violate silently:

- any query whose semantic hash (oracle SQL + docstring-stripped AST
  of the query fn and its transitive omim_spark-internal helper
  closure) differs from the committed manifest MUST be listed in
  ``_VERIFY_FIRST`` — the driver's next verification window;
- the window must fit the driver's 50-slot gate;
- the closure walker itself is pinned against regressions (if it went
  blind to helpers or constants, a refactor like round 5's
  q_ann_ivf_probe slip would sail through unnoticed).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import ledger  # noqa: E402


def test_changed_queries_are_in_verification_window():
    from omim_spark.workload import _VERIFY_FIRST

    changed = ledger.changed_queries()
    unwindowed = [n for n in changed if n not in _VERIFY_FIRST]
    assert not unwindowed, (
        f"queries changed since last driver-green but NOT in "
        f"_VERIFY_FIRST: {unwindowed} — add them to the window in "
        "omim_spark/workload/__init__.py (and regenerate the manifest "
        "at end of round with `python tools/ledger.py update`)"
    )


def test_window_fits_driver_gate():
    from omim_spark.workload import _VERIFY_FIRST

    assert len(_VERIFY_FIRST) <= 50, (
        "_VERIFY_FIRST exceeds the driver's 50-query window — entries "
        "past slot 50 would record nothing this round"
    )
    assert len(set(_VERIFY_FIRST)) == len(_VERIFY_FIRST)


def test_manifest_covers_every_registered_query():
    """A query missing from the manifest is treated as changed (so it
    must be windowed) — but a STALE manifest entry for a deleted query
    is dead weight that hides renames; keep the key sets equal."""
    from omim_spark.workload import QUERIES

    manifest = {
        n for n in json.loads(ledger.MANIFEST.read_text())
        if not n.startswith("_")  # _meta bookkeeping block
    }
    missing = sorted(set(QUERIES) - manifest)
    from omim_spark.workload import _VERIFY_FIRST

    # new queries may legitimately be absent mid-round IF windowed
    unwindowed_missing = [n for n in missing if n not in _VERIFY_FIRST]
    assert not unwindowed_missing
    stale = sorted(manifest - set(QUERIES))
    assert not stale, f"manifest entries for unregistered queries: {stale}"


def test_closure_walker_sees_helpers_constants_and_cross_module_refs():
    """Pin the AST walker's resolution power to the exact failure modes
    it exists to catch (each assertion names a real dependency whose
    silent loss would re-open the round-5 hole)."""
    parts: dict[str, str] = {}
    ledger._closure(
        "omim_spark.workload.similarity", "q_ann_ivf_probe", set(), parts
    )
    # module-local helper functions (the round-5 slip: these were
    # refactored without re-windowing the query)
    assert "omim_spark.workload.similarity:_ivf_train" in parts
    assert "omim_spark.workload.similarity:_ivf_probe_cells" in parts
    # module-level constants
    assert "omim_spark.workload.similarity:IVF_NPROBE" in parts

    parts = {}
    ledger._closure(
        "omim_spark.workload.similarity", "q_crossmodal_neardup", set(), parts
    )
    # function-local `from omim_spark.workload.dedup import MAX_DF`
    assert "omim_spark.workload.dedup:MAX_DF" in parts
    assert "omim_spark.workload.dedup:_shingles" in parts

    parts = {}
    ledger._closure(
        "omim_spark.workload.dedup", "q_lsh_recall_sampled", set(), parts
    )
    # function-local RELATIVE import (`from ..operators.sampling import
    # md5_bucket`) and transitive constants
    assert "omim_spark.operators.sampling:md5_bucket" in parts
    assert "omim_spark.workload.dedup:RECALL_SAMPLE_CELLS" in parts


def test_window_fill_is_stalest_first():
    """Age rotation (r7): after _VERIFY_FIRST, the registry order —
    and therefore the driver's 50-slot window fill — must be ascending
    last-green round, so long-unverified queries re-earn driver rows
    instead of resting on rounds-old greens.

    In the STAMPED end-of-round state (the manifest's _meta carries
    the exact current _VERIFY_FIRST), the persisted window is replayed
    first instead: stamping green=N sorts the window's queries last,
    so without the replay the driver would verify a different 50 than
    the manifest claims green for.  The first 50 must then equal the
    stored window exactly, and staleness ordering must hold for the
    remainder."""
    from omim_spark.workload import QUERIES, _VERIFY_FIRST, _VERIFY_LAST
    from omim_spark.workload import _last_green_rounds, _stamped_window

    green = _last_green_rounds()
    assert green, "ledger manifest missing or empty"
    stamped = _stamped_window()
    if stamped:
        # committed end-of-round state: driver window == stamped set
        assert list(QUERIES)[: len(stamped)] == stamped
        rest = [
            n
            for n in QUERIES
            if n not in stamped and n not in _VERIFY_LAST
        ]
    else:
        rest = [
            n
            for n in QUERIES
            if n not in _VERIFY_FIRST and n not in _VERIFY_LAST
        ]
    greens = [green.get(n, 0) for n in rest]
    assert greens == sorted(greens), (
        "registry fill is not ascending last-green round — age "
        "rotation broken"
    )
    # the manifest carries a real green round for every known query
    assert all(isinstance(v, int) for v in green.values())


def test_update_stamps_window_greens(tmp_path, monkeypatch):
    """`ledger.py update --round N` stamps green=N for exactly the
    window it computes (_VERIFY_FIRST + the stalest fill, from the
    PRE-update manifest greens) and preserves older greens elsewhere —
    the mechanism age rotation rests on."""
    from omim_spark.workload import QUERIES, _VERIFY_FIRST, _VERIFY_LAST

    target = tmp_path / "manifest.json"
    # seed: legacy bare-hash entries (green must default to 0)
    target.write_text(json.dumps({n: "stale" for n in QUERIES}))
    monkeypatch.setattr(ledger, "MANIFEST", target)
    assert all(v["green"] == 0 for v in ledger.load_manifest().values())

    ledger._update(7)
    out = json.loads(target.read_text())
    window = out["_meta"]["window"]
    assert len(window) == min(50, len(QUERIES))
    assert window[: len(_VERIFY_FIRST)] == list(_VERIFY_FIRST)
    assert not set(window) & set(_VERIFY_LAST)
    entries = {n: v for n, v in out.items() if not n.startswith("_")}
    assert set(entries) == set(QUERIES)
    for n, v in entries.items():
        assert v["green"] == (7 if n in set(window) else 0), n
        assert v["hash"] != "stale"
    # the stored window + verify_first make the stamp replayable
    assert out["_meta"]["round"] == 7
    assert out["_meta"]["verify_first"] == list(_VERIFY_FIRST)


def test_update_rotates_window_even_without_verify_first_change(
    tmp_path, monkeypatch
):
    """Liveness (r7 ADVICE): if a round ends WITHOUT touching
    _VERIFY_FIRST, the next `update` must still hand the window's free
    slots to the longest-unverified queries — not replay the previous
    round's stamped window (which would re-stamp the same 50 forever
    and starve the tail)."""
    from omim_spark.workload import QUERIES, _VERIFY_FIRST, _VERIFY_LAST

    target = tmp_path / "manifest.json"
    target.write_text(json.dumps({n: "stale" for n in QUERIES}))
    monkeypatch.setattr(ledger, "MANIFEST", target)

    ledger._update(7)
    w7 = set(json.loads(target.read_text())["_meta"]["window"])
    # second update, same _VERIFY_FIRST: the fill slots must rotate to
    # the green=0 tail that w7 left unstamped
    ledger._update(8)
    out = json.loads(target.read_text())
    w8 = out["_meta"]["window"]
    assert w8[: len(_VERIFY_FIRST)] == list(_VERIFY_FIRST)
    fill8 = [n for n in w8 if n not in _VERIFY_FIRST]
    unstamped_after_7 = set(QUERIES) - w7 - set(_VERIFY_LAST)
    # every fill slot goes to a query w7 did NOT stamp (green=0 sorts
    # before green=7), as long as enough unstamped queries exist
    expected = min(len(fill8), len(unstamped_after_7))
    assert sum(n in unstamped_after_7 for n in fill8) == expected
    for n, v in out.items():
        if n.startswith("_"):
            continue
        assert v["green"] == (
            8 if n in set(w8) else (7 if n in w7 else 0)
        ), n


def test_docstring_edits_do_not_change_hashes():
    """Cosmetic doc edits must not force re-verification — only
    semantic changes rotate a query into the window."""
    import ast

    src_a = "def f(x):\n    'old doc'\n    return x + 1\n"
    src_b = "def f(x):\n    'new doc, totally rewritten'\n    return x + 1\n"
    src_c = "def f(x):\n    'old doc'\n    return x + 2\n"
    d = lambda s: ledger._dump(ast.parse(s).body[0])  # noqa: E731
    assert d(src_a) == d(src_b)
    assert d(src_a) != d(src_c)


def test_sql_factory_queries_hash_their_sql():
    """sql_query-registered queries (fn is a factory closure) must
    still change hash when their SQL text changes — the SQL is carried
    by the oracle field, which semantic_hashes() folds in."""
    from omim_spark.workload import QUERIES

    hashes = ledger.semantic_hashes()
    a, b = "q04_exists_priority", "q12_case_agg_shipmode"
    assert "<locals>" in QUERIES[a].fn.__qualname__
    # identical factory machinery, different SQL → different hashes
    assert hashes[a] != hashes[b]


def test_update_is_idempotent_within_a_round(tmp_path, monkeypatch):
    """Re-running `update --round N` (a query added late in the round)
    must reproduce the SAME stamp, not mark 50 more queries green:
    the pre-round baseline persisted in _meta is the staleness input,
    so a second stamp recomputes the same window instead of treating
    the first stamp's greens as history."""
    from omim_spark.workload import QUERIES

    target = tmp_path / "manifest.json"
    target.write_text(json.dumps({n: "stale" for n in QUERIES}))
    monkeypatch.setattr(ledger, "MANIFEST", target)

    ledger._update(9)
    first = json.loads(target.read_text())
    ledger._update(9)
    second = json.loads(target.read_text())
    assert first == second
    stamped = [
        n for n, v in second.items()
        if not n.startswith("_") and v["green"] == 9
    ]
    assert len(stamped) == min(50, len(QUERIES))
    # and a LATER round uses the stamped state as its baseline
    ledger._update(10)
    third = json.loads(target.read_text())
    assert third["_meta"]["baseline_green"] != second["_meta"][
        "baseline_green"
    ]
