"""Title normalization pipeline (SURVEY §2.7 T1-T8).

Reference: omim2obo/parsers/omim_entry_parser.py:163-369 and
omim2obo/utils/romanplus.py.  Everything structural (splitting,
FORMERLY partitioning, suffix removal) is a Column expression; only
the two genuinely procedural pieces — roman-numeral conversion inside
``cleanup_title`` and abbreviation detection/recapitalization — are
Python, and they run as Arrow-batched pandas UDFs (vectorized
transfer, no per-row pickling).

Fidelity notes (deliberate, documented deviations from reference
accidents):
- ``detect_abbreviations`` (omim_entry_parser.py:163-190) calls
  ``re.findall`` on a pattern with a capture group, so dotted acronyms
  yield only the last group (e.g. 'B.' from 'A.B.').  We replicate
  that exactly — it feeds the recapitalization matcher.
- ``remove_included_and_formerly_suffixes`` (omim_entry_parser.py:
  316-320) passes ``re.IGNORECASE`` as ``re.sub``'s *count* argument,
  so matching is case-SENSITIVE and capped at 2 replacements.  We keep
  case-sensitive matching (the data is uppercase) but replace all
  occurrences.
- ``recapitalize_acronyms_in_title`` iterates a Python set (order
  nondeterministic); we sort candidates for determinism.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# Roman numerals (reference omim2obo/utils/romanplus.py:38-83)
# ---------------------------------------------------------------------------

_ROMAN_MAP = (
    ("M", 1000), ("CM", 900), ("D", 500), ("CD", 400),
    ("C", 100), ("XC", 90), ("L", 50), ("XL", 40),
    ("X", 10), ("IX", 9), ("V", 5), ("IV", 4), ("I", 1),
)

# Permissive pattern: a roman numeral plus exactly one trailing
# uppercase letter that may itself be consumed as part of the numeral
# via backtracking (romanplus.py:55-67 — "differs from original
# roman.py": the suffix letter is REQUIRED by the regex, which is what
# lets bare 'III' match with ones='II' + suffix='I').
ROMAN_PATTERN = re.compile(
    r"^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})[A-Z]$"
)


def to_roman(num: int) -> str:
    if not 0 < num < 5000:
        raise ValueError(f"number {num} out of range (must be 1..4999)")
    out = []
    for numeral, value in _ROMAN_MAP:
        while num >= value:
            out.append(numeral)
            num -= value
    return "".join(out)


def from_roman(s: str) -> int:
    """Greedy numeral scan; trailing non-numeral characters are
    ignored (romanplus.py:69-83 behavior — no tail validation)."""
    result = 0
    index = 0
    for numeral, value in _ROMAN_MAP:
        while s[index : index + len(numeral)] == numeral:
            result += value
            index += len(numeral)
    return result


# ---------------------------------------------------------------------------
# cleanup_title (reference omim_entry_parser.py:194-270)
# ---------------------------------------------------------------------------

_CONJUNCTIONS = ["and", "but", "yet", "for", "nor", "so"]
_LITTLE_PREPS = ["at", "by", "in", "of", "on", "to", "up", "as", "it", "or"]
_ARTICLES = ["a", "an", "the"]
_LOWER_ALWAYS = set(_CONJUNCTIONS + _LITTLE_PREPS + _ARTICLES)


def cleanup_title_py(
    title: str,
    word_replacements: dict[str, str] | None = None,
    case_method: str = "lower",
) -> str:
    """Word-wise: roman→arabic from word 2 on (keeping non-roman
    suffixes, IIIB→3B; only 0<n<100 so 'SYNDROME C' survives), then
    per-word recasing via ``case_method`` ('lower' | 'upper' | 'title'
    | 'capitalize', reference omim_entry_parser.py:194-270's
    ``replacement_case_method``), then forced lowercase for
    conjunctions/prepositions/articles at any position but the first,
    then dictionary replacement.

    Documented deviation: the reference tests the already-recased word
    against its lowercase stop-lists (omim_entry_parser.py:263-264),
    so its conditional-lowercase branch can never fire for any case
    method — dead code contradicting its own comment ("replace
    interior conjunctions ... with lowercase, always").  We implement
    the stated intent (case-insensitive membership).  Identical output
    for the default 'lower', which is the only method any reference
    call site uses (main.py:292, omim_entry_parser.py:90-101,340)."""
    if title is None:
        return None
    word_replacements = word_replacements or {}
    fixed = []
    for i, word in enumerate(title.split(), start=1):
        if i > 1 and ROMAN_PATTERN.match(word):
            num = from_roman(word)
            if 0 < num < 100:
                suffix = word.replace(to_roman(num), "", 1)
                word = f"{num}{suffix}"
        word = getattr(word, case_method)()
        if word.lower() in _LOWER_ALWAYS and i != 1:
            word = word.lower()
        word = word_replacements.get(word, word)
        fixed.append(word)
    return " ".join(fixed)


# ---------------------------------------------------------------------------
# Abbreviation detection / recapitalization
# (reference omim_entry_parser.py:163-190, 273-313)
# ---------------------------------------------------------------------------

_ACRONYM_NO_PERIODS = re.compile(r"[A-Z][A-Z0-9]+")
_ACRONYM_WITH_PERIODS = re.compile(r"[A-Z]\.([A-Z0-9]\.)+")  # findall → group!
_TITLE_CASED_ABBREV = re.compile(r"[A-Z][a-zA-Z]+\.")


def detect_abbreviations_py(
    label: str, capitalization_threshold: float = 0.75
) -> list[str]:
    words = label.split()
    if not words:
        return []
    fully_capitalized = sum(1 for w in words if w.upper() == w)
    is_largely_uppercase = fully_capitalized / len(words) >= capitalization_threshold
    acronyms_without_periods = (
        [] if is_largely_uppercase else _ACRONYM_NO_PERIODS.findall(label)
    )
    title_cased = _TITLE_CASED_ABBREV.findall(label)
    # findall on a grouped pattern returns the group text — reference
    # behavior preserved (see module docstring).
    with_periods = _ACRONYM_WITH_PERIODS.findall(label)
    return with_periods + acronyms_without_periods + title_cased


def recapitalize_acronyms_py(title: str, known_abbrevs: list[str] | None) -> str:
    """Word-wise: a word equal to the lowercase of any known or
    inferred abbreviation is replaced by the abbreviation's canonical
    casing.  Candidates sorted for determinism."""
    if title is None:
        return None
    abbrevs = set(known_abbrevs or []) | set(detect_abbreviations_py(title))
    if not abbrevs:
        return title
    out = []
    for word in title.split():
        for abbrev in sorted(abbrevs):
            if abbrev.lower() == word:
                out.append(abbrev)
                break
        else:
            out.append(word)
    return " ".join(out)


# ---------------------------------------------------------------------------
# Pandas UDF wrappers (Arrow-batched — the only Python in the plan)
# ---------------------------------------------------------------------------


def cleanup_title_udf(word_replacements: dict[str, str] | None = None):
    """pandas UDF: title → cleaned title.  The replacement dict ships
    once in the UDF closure (broadcast by Spark's task serialization),
    not per row."""
    replacements = dict(word_replacements or {})

    @F.pandas_udf(StringType())
    def _cleanup(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: cleanup_title_py(t, replacements))

    return _cleanup


@F.pandas_udf(StringType())
def recapitalize_acronyms_udf(
    titles: pd.Series, abbrevs: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            recapitalize_acronyms_py(t, list(a) if a is not None else [])
            for t, a in zip(titles, abbrevs)
        ]
    )


def cleanup_titles_array_udf(word_replacements: dict[str, str] | None = None):
    """pandas UDF over array<string>: clean every title in the array."""
    replacements = dict(word_replacements or {})

    @F.pandas_udf(ArrayType(StringType()))
    def _cleanup_arr(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda arr: None
                if arr is None
                else [cleanup_title_py(t, replacements) for t in arr]
            )

    return _cleanup_arr


@F.pandas_udf(ArrayType(StringType()))
def recapitalize_acronyms_array_udf(
    titles: pd.Series, abbrevs: pd.Series
) -> pd.Series:
    out = []
    for arr, ab in zip(titles, abbrevs):
        ab_list = list(ab) if ab is not None else []
        out.append(
            None
            if arr is None
            else [recapitalize_acronyms_py(t, ab_list) for t in arr]
        )
    return pd.Series(out)


# ---------------------------------------------------------------------------
# Structural title expressions (pure Column — T3/T4/T5)
# ---------------------------------------------------------------------------


def title_symbol_pairs(col: Column) -> tuple[Column, Column]:
    """`T1;S1;S2;;T2;;T3;S3` → (titles array, symbols array)
    (T3 — omim_entry_parser.py:344-369: pairs split on ';;', first
    element of each pair is a title, the rest are symbols)."""
    pairs = F.split(col, ";;")
    titles = F.transform(pairs, lambda p: F.trim(F.element_at(F.split(p, ";"), 1)))
    symbols = F.flatten(
        F.transform(
            pairs,
            lambda p: F.transform(
                F.slice(
                    F.split(p, ";"), 2, F.greatest(F.size(F.split(p, ";")) - 1, F.lit(1))
                ),
                lambda x: F.trim(x),
            ),
        )
    )
    return titles, symbols


def partition_former(arr: Column) -> tuple[Column, Column]:
    """Split an array into (current, former) by the ', FORMERLY'
    marker (T4 — omim_entry_parser.py:323-331, case-insensitive)."""
    has_formerly = lambda x: F.upper(x).contains(", FORMERLY")  # noqa: E731
    current = F.filter(arr, lambda x: ~has_formerly(x))
    former = F.filter(arr, has_formerly)
    return current, former


def strip_suffix_markers(col: Column) -> Column:
    """Remove ', FORMERLY' / ', INCLUDED' suffixes (T5 —
    omim_entry_parser.py:316-320; case-sensitive, see module
    docstring)."""
    return F.regexp_replace(
        F.regexp_replace(col, r",\s*FORMERLY", ""), r",\s*INCLUDED", ""
    )
