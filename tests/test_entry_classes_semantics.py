"""G6 obsolete-suppression semantics, pinned two ways:

1. A mechanical AST trace of the reference's OBSOLETE branch
   (main.py:276-287): the ``continue`` that suppresses the rest of the
   per-entry emission sits INSIDE ``if omim_replaced.get(omim_id,
   None):`` — so an unreplaced obsolete falls through.  If the
   reference ever restructured that control flow, this test would
   fail before our emitter silently diverged (same spirit as
   TestDriverGateConstantsTraceToReference: the r11 fix is traceable
   to reference source, not builder-asserted).

2. A property test: emit_entry_classes over randomized entry rows must
   satisfy the per-branch triple-count invariants of that control
   flow — replaced obsoletes emit exactly their replacement triples
   (2 rows for single, 1 + |replaced| for multi), unreplaced obsoletes
   emit exactly deprecated + label + pref-synonym on top of the class
   row, and every non-obsolete entry carries a label.
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REF_MAIN = Path("/root/reference/omim2obo/main.py")

# Degrade gracefully off this machine (same guard as
# test_titles_reference_parity.py): the tripwire only means something
# where the read-only reference checkout exists.  Scoped to the
# AST-tripwire class ONLY — TestEmitEntryClassesInvariants exercises
# the project's own emit_entry_classes and must run everywhere.
_needs_reference = pytest.mark.skipif(
    not REF_MAIN.exists(), reason="reference checkout not present"
)


@_needs_reference
class TestReferenceObsoleteControlFlow:
    def _obsolete_if(self) -> ast.If:
        tree = ast.parse(REF_MAIN.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.If):
                src = ast.unparse(node.test)
                if "OmimType.OBSOLETE" in src:
                    return node
        pytest.fail("reference OBSOLETE branch not found")

    def test_continue_is_gated_on_replacement(self):
        """main.py:276-287 — `continue` appears ONLY inside the
        `if omim_replaced.get(omim_id, None):` sub-branch, never
        directly under the OBSOLETE test: the reference falls through
        for unreplaced obsoletes (the r10 ADVICE divergence the r11
        emit_entry_classes gate fix matches)."""
        obs = self._obsolete_if()
        # No bare continue directly under the OBSOLETE if
        direct = [n for n in obs.body if isinstance(n, ast.Continue)]
        assert not direct, "reference now suppresses ALL obsoletes"
        # There IS a continue, and its enclosing if tests omim_replaced
        inner_ifs = [n for n in ast.walk(obs) if isinstance(n, ast.If)]
        gated = [
            n
            for n in inner_ifs
            if "omim_replaced" in ast.unparse(n.test)
            and any(isinstance(c, ast.Continue) for c in ast.walk(n))
        ]
        assert gated, "reference no longer gates continue on omim_replaced"
        # and that is the ONLY continue in the branch
        all_continues = [
            n for n in ast.walk(obs) if isinstance(n, ast.Continue)
        ]
        gated_continues = [
            n for g in gated for n in ast.walk(g) if isinstance(n, ast.Continue)
        ]
        assert set(map(id, all_continues)) == set(map(id, gated_continues))

    def test_deprecated_fires_for_every_obsolete(self):
        """owl:deprecated is added BEFORE the replacement gate — every
        obsolete entry gets it, replaced or not (mirrored by the
        unconditional is_obsolete WHEN in emit_entry_classes)."""
        obs = self._obsolete_if()
        first_stmts = ast.unparse(obs.body[0])
        assert "deprecated" in first_stmts


_TYPES = st.sampled_from(
    ["OBSOLETE", "GENE", "HAS_AFFECTED_FEATURE", "PHENOTYPE",
     "HERITABLE_PHENOTYPIC_MARKER", "SUSPECTED"]
)
_ENTRY = st.tuples(
    st.integers(100000, 999999).map(str),
    _TYPES,
    st.lists(st.integers(100000, 999999).map(str), max_size=3, unique=True),
    st.text(
        alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ ", min_size=1, max_size=20
    ).map(str.strip).filter(bool),
    st.lists(
        st.text(alphabet="ABCDEFGH", min_size=1, max_size=6),
        max_size=2, unique=True,
    ),
)

_COLS = (
    "mim_number string, omim_type string, replaced_by array<string>, "
    "pref_title string, pref_symbols array<string>, "
    "alt_titles array<string>, alt_symbols array<string>, "
    "former_alt_titles array<string>, former_alt_symbols array<string>, "
    "included_titles array<string>, included_symbols array<string>, "
    "former_included_titles array<string>, former_included_symbols array<string>"
)


class TestEmitEntryClassesInvariants:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(_ENTRY, min_size=1, max_size=8, unique_by=lambda e: e[0]))
    def test_branch_row_counts(self, spark, entries):
        from omim_spark.triples import emit_entry_classes

        rows = [
            (mim, typ, reps, title, syms, [], [], [], [], [], [], [], [])
            for mim, typ, reps, title, syms in entries
        ]
        df = spark.createDataFrame(rows, _COLS)
        out = emit_entry_classes(df).collect()
        by_subj: dict[str, list] = {}
        for r in out:
            by_subj.setdefault(r.subject, []).append(r)
        for mim, typ, reps, title, syms in entries:
            uri = f"OMIM:{mim}"
            preds = sorted(r.predicate for r in by_subj.get(uri, []))
            if typ == "OBSOLETE" and len(reps) == 1:
                assert preds == ["IAO:0100001", "owl:deprecated", "rdf:type"]
            elif typ == "OBSOLETE" and len(reps) > 1:
                assert preds == (
                    ["oboInOwl:consider"] * len(reps)
                    + ["owl:deprecated", "rdf:type"]
                )
            elif typ == "OBSOLETE":
                # the r11 fall-through: label + pref synonym survive,
                # and (like the reference's synonym loops) every pref
                # SYMBOL also lands as an abbreviation synonym (its
                # OMO axiom rows carry the bnode subject, not uri)
                assert preds == (
                    ["oboInOwl:hasExactSynonym"] * (1 + len(syms))
                    + ["owl:deprecated", "rdf:type", "rdfs:label"]
                )
                syns = {
                    r.object
                    for r in by_subj[uri]
                    if r.predicate == "oboInOwl:hasExactSynonym"
                }
                assert syns == {title, *syms}
                labels = [
                    r.object for r in by_subj[uri] if r.predicate == "rdfs:label"
                ]
                assert labels == [title]  # never the symbol: not a gene type
            else:
                assert "rdfs:label" in preds and "owl:deprecated" not in preds
                labels = [
                    r.object for r in by_subj[uri] if r.predicate == "rdfs:label"
                ]
                is_gene = typ in ("GENE", "HAS_AFFECTED_FEATURE")
                assert labels == [syms[0] if is_gene and syms else title]
