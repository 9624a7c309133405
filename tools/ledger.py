"""Rotation-ledger enforcement: mechanically tie "this query's code
changed" to "this query is in the driver's verification window".

The driver's correctness gate verifies the FIRST 50 registry entries
per round (``omim_spark/workload/__init__.py:_VERIFY_FIRST``).  The
repo's cumulative invariant is: every registered query has a
driver-green CORRECTNESS row under its CURRENT code.  Until round 5
that invariant was curated by hand — and round 5 shipped one slip
(q_ann_ivf_probe's shared helpers were refactored without re-entering
the window).  This tool makes the ledger mechanical:

- ``semantic_hash(name)`` — a stable hash of the query's semantics:
  the registered oracle SQL plus the AST (docstrings stripped, so
  comment/doc edits don't force re-verification) of the query function
  and every transitively reachable module-local helper, module-level
  constant, and ``omim_spark``-internal import it uses.
- ``tests/ledger_manifest.json`` — per query, the committed hash as of
  the last driver-green state PLUS the round of that green
  (``{"hash": ..., "green": N}``).  Regenerated (``python
  tools/ledger.py update --round N``) at end of round, AFTER
  _VERIFY_FIRST is final: the driver then verifies exactly that code,
  so the manifest is the next round's "last driver-green" baseline,
  and the queries inside the driver's 50-slot window get their
  ``green`` stamped to the closing round.
- ``tests/test_ledger.py`` — fails the suite if any query's current
  hash differs from the manifest (or is new) while the query is NOT in
  _VERIFY_FIRST.  The ledger is enforced, not curated.
- Age rotation: the workload registry (``omim_spark/workload``) sorts
  the queries AFTER _VERIFY_FIRST by ascending ``green`` round, so the
  driver window's free slots always re-verify the longest-unverified
  queries — every query re-earns a driver row every ~3 rounds instead
  of only when edited.

Over-inclusion is safe and intended: a name that merely *looks* used
(e.g. shadowed by a local) pulls its helper into the hash, which can
only make the ledger more sensitive, never blind.

Usage:
    python tools/ledger.py check              # exit 1 on unwindowed changes
    python tools/ledger.py diff               # list changed/new queries
    python tools/ledger.py update --round N   # rewrite the manifest
"""

from __future__ import annotations

import ast
import copy
import hashlib
import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MANIFEST = Path(__file__).resolve().parent.parent / "tests" / "ledger_manifest.json"

_PKG_PREFIX = "omim_spark"


def _module_source_tree(modname: str) -> ast.Module | None:
    try:
        mod = importlib.import_module(modname)
    except Exception:
        return None
    try:
        import inspect

        return ast.parse(inspect.getsource(mod))
    except (OSError, TypeError):
        return None


def _strip_docstrings(node: ast.AST) -> ast.AST:
    node = copy.deepcopy(node)
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(n, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                n.body = body[1:] or [ast.Pass()]
    return node


def _dump(node: ast.AST) -> str:
    return ast.dump(_strip_docstrings(node), include_attributes=False)


def _resolve_relative(modname: str, node: ast.ImportFrom) -> str:
    if node.level == 0:
        return node.module or ""
    # modname is always a module (never a package __init__ here for
    # workload query modules); its package is everything before the
    # last component, and each extra level strips one more.
    parts = modname.split(".")
    base = parts[: len(parts) - node.level]
    if node.module:
        base = base + node.module.split(".")
    return ".".join(base)


class _ModuleIndex:
    """Top-level name → AST node / import target map for one module."""

    def __init__(self, modname: str, tree: ast.Module):
        self.modname = modname
        self.funcs: dict[str, ast.AST] = {}
        self.classes: dict[str, ast.AST] = {}
        self.assigns: dict[str, ast.AST] = {}
        self.import_from: dict[str, tuple[str, str]] = {}
        self.import_mod: dict[str, str] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                self.funcs[node.name] = node
            elif isinstance(node, ast.ClassDef):
                self.classes[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.assigns[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                self.assigns[node.target.id] = node
            elif isinstance(node, ast.ImportFrom):
                mod = _resolve_relative(modname, node)
                for a in node.names:
                    self.import_from[a.asname or a.name] = (mod, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    self.import_mod[a.asname or a.name.split(".")[0]] = a.name


_INDEX_CACHE: dict[str, _ModuleIndex | None] = {}


def _index(modname: str) -> _ModuleIndex | None:
    if modname not in _INDEX_CACHE:
        tree = _module_source_tree(modname)
        _INDEX_CACHE[modname] = (
            _ModuleIndex(modname, tree) if tree is not None else None
        )
    return _INDEX_CACHE[modname]


def _collect_refs(
    node: ast.AST, modname: str
) -> tuple[set[str], list[tuple[str, str]], list[tuple[str, str]]]:
    """From a function/constant AST: (plain names, attribute pairs
    (base_name, attr), function-local from-imports resolved to
    (absolute module, name))."""
    names: set[str] = set()
    attrs: list[tuple[str, str]] = []
    local_imports: list[tuple[str, str]] = []
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            names.add(n.id)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.append((n.value.id, n.attr))
        elif isinstance(n, ast.ImportFrom):
            # function-local `from X import y` (several queries import
            # helpers lazily to avoid module cycles); resolve relative
            # levels against the defining module
            mod = _resolve_relative(modname, n)
            for a in n.names:
                local_imports.append((mod, a.name))
                names.discard(a.asname or a.name)
    return names, attrs, local_imports


def _closure(
    modname: str, name: str, visited: set[tuple[str, str]],
    out: dict[str, str],
) -> None:
    """Accumulate {qualified_name: ast_dump} for ``name`` in
    ``modname`` and everything omim_spark-internal it references."""
    key = (modname, name)
    if key in visited:
        return
    visited.add(key)
    idx = _index(modname)
    if idx is None:
        return
    node = (
        idx.funcs.get(name) or idx.classes.get(name) or idx.assigns.get(name)
    )
    if node is None:
        # imported name: follow into the defining module
        if name in idx.import_from:
            src_mod, src_name = idx.import_from[name]
            target_mod = f"{src_mod}.{src_name}"
            if src_mod.startswith(_PKG_PREFIX):
                if _index(target_mod) is not None:
                    return  # module alias — resolved at attribute sites
                _closure(src_mod, src_name, visited, out)
        return
    out[f"{modname}:{name}"] = _dump(node)
    names, attrs, local_imports = _collect_refs(node, modname)
    for n in sorted(names):
        _closure(modname, n, visited, out)
    for base, attr in attrs:
        # `dedup.MAX_DF` via `from . import dedup` or `import pkg.mod`
        target = None
        if base in idx.import_from:
            src_mod, src_name = idx.import_from[base]
            cand = f"{src_mod}.{src_name}"
            if cand.startswith(_PKG_PREFIX) and _index(cand) is not None:
                target = cand
        elif base in idx.import_mod and idx.import_mod[base].startswith(
            _PKG_PREFIX
        ):
            target = idx.import_mod[base]
        if target:
            _closure(target, attr, visited, out)
    for mod, nm in local_imports:
        if mod.startswith(_PKG_PREFIX):
            _closure(mod, nm, visited, out)


def semantic_hashes() -> dict[str, str]:
    """{query name: semantic hash} for every registered query."""
    from omim_spark.workload import QUERIES

    hashes: dict[str, str] = {}
    for name, qd in QUERIES.items():
        parts: dict[str, str] = {}
        modname = qd.fn.__module__
        if "<locals>" in qd.fn.__qualname__:
            # sql_query-style factory registration: the semantics ARE
            # the SQL text (hashed below via qd.oracle, which is the
            # same string both engines run) plus the factory machinery.
            factory = qd.fn.__qualname__.split(".<locals>")[0]
            visited: set[tuple[str, str]] = set()
            _closure(modname, factory, visited, parts)
        else:
            visited = set()
            _closure(modname, qd.fn.__name__, visited, parts)
        blob = "\n".join(f"{k}={v}" for k, v in sorted(parts.items()))
        blob += f"\noracle={qd.oracle or ''}"
        hashes[name] = hashlib.sha256(blob.encode()).hexdigest()
    return hashes


def load_manifest() -> dict[str, dict]:
    """{name: {"hash": ..., "green": N}}; legacy bare-hash entries
    (pre-r7 format) load with green=0 so they sort oldest.  The
    ``_meta`` bookkeeping block (round / verify_first / window) is
    excluded — read it via :func:`load_meta`."""
    if not MANIFEST.exists():
        return {}
    raw = json.loads(MANIFEST.read_text())
    return {
        n: (v if isinstance(v, dict) else {"hash": v, "green": 0})
        for n, v in raw.items()
        if not n.startswith("_")
    }


def load_meta() -> dict:
    """The manifest's ``_meta`` block: {"round": N, "verify_first":
    [...], "window": [...]} as of the last ``update`` — empty dict if
    absent (pre-stamp manifests)."""
    if not MANIFEST.exists():
        return {}
    return json.loads(MANIFEST.read_text()).get("_meta", {})


def changed_queries() -> list[str]:
    """Queries whose current semantic hash differs from the manifest
    (including queries the manifest has never seen)."""
    manifest = load_manifest()
    return sorted(
        n
        for n, h in semantic_hashes().items()
        if manifest.get(n, {}).get("hash") != h
    )


def _update(round_no: int) -> None:
    """Rewrite the manifest: current hashes everywhere; ``green``
    stamped to ``round_no`` for the queries inside the driver's
    50-slot window (the first 50 registry entries — exactly what the
    driver will verify against this committed state), preserved for
    the rest.

    The window itself is PERSISTED in ``_meta`` (with the
    _VERIFY_FIRST list it was computed under): stamping green=N moves
    those queries to the END of a pure staleness sort, so without the
    stored window the committed registry order would no longer put
    the stamped set first and the driver would verify a different 50
    than the manifest claims.  workload._reorder replays the stored
    window while _VERIFY_FIRST is unchanged (the committed
    end-of-round state the driver sees) and falls back to staleness
    fill as soon as the next round's builder touches the list."""
    from omim_spark.workload import QUERIES, _VERIFY_FIRST, _VERIFY_LAST

    old = load_manifest()
    meta_old = load_meta()
    # Baseline greens = each query's last green BEFORE this round's
    # stamp.  Normally that is just the manifest — but re-running
    # update for the SAME round (new query added late in the round)
    # must not treat the earlier stamp's green=round_no as history:
    # without this, every re-stamp marks 50 MORE queries green and the
    # tail ends the round claiming driver rows it will never get.  The
    # pre-round baseline is persisted in _meta at stamp time, making
    # update idempotent within a round.
    if meta_old.get("round") == round_no and "baseline_green" in meta_old:
        baseline = dict(meta_old["baseline_green"])
    else:
        baseline = {
            n: v.get("green", 0) for n, v in old.items()
        }
    # Liveness (r7 ADVICE): compute the stamped window from the
    # PRE-ROUND staleness sort, NOT from the current registry order.
    # The registry replays the previous round's _meta.window while
    # _VERIFY_FIRST is unchanged, so `list(QUERIES)[:50]` here would
    # re-stamp the same 50 forever in a round that never touched the
    # list — the longest-unverified tail would never rotate in.
    front = [n for n in _VERIFY_FIRST if n in QUERIES]
    pos = {n: i for i, n in enumerate(QUERIES)}
    rest = sorted(
        (
            n
            for n in QUERIES
            if n not in set(front) and n not in _VERIFY_LAST
        ),
        key=lambda n: (baseline.get(n, 0), pos[n]),
    )
    window = (front + rest)[:50]
    wset = set(window)
    manifest: dict = {
        n: {
            "hash": h,
            "green": round_no if n in wset else baseline.get(n, 0),
        }
        for n, h in semantic_hashes().items()
    }
    manifest["_meta"] = {
        "round": round_no,
        "verify_first": list(_VERIFY_FIRST),
        "window": window,
        "baseline_green": {
            n: baseline.get(n, 0) for n in sorted(semantic_hashes())
        },
    }
    MANIFEST.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {MANIFEST} (window of {len(window)} stamped green={round_no})")


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "update":
        if len(sys.argv) < 4 or sys.argv[2] != "--round":
            print("usage: python tools/ledger.py update --round N")
            return 2
        _update(int(sys.argv[3]))
        return 0
    changed = changed_queries()
    if cmd == "diff":
        for n in changed:
            print(n)
        print(f"{len(changed)} changed/new")
        return 0
    from omim_spark.workload import _VERIFY_FIRST

    unwindowed = [n for n in changed if n not in _VERIFY_FIRST]
    for n in changed:
        mark = "OK (in window)" if n in _VERIFY_FIRST else "UNWINDOWED"
        print(f"{mark:14s} {n}")
    if unwindowed:
        print(
            f"\n{len(unwindowed)} changed quer{'y' if len(unwindowed)==1 else 'ies'} "
            "NOT in _VERIFY_FIRST — add them to the window "
            "(omim_spark/workload/__init__.py) or revert the change"
        )
        return 1
    print(f"{len(changed)} changed, all in the verification window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
