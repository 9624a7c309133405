"""Text-analysis operators for training-data pipelines: quality
scoring, heuristic language ID, token counting, fingerprinting.

Everything is a pure Column expression (JVM codegen, zero shuffles) —
these run as map stages over the corpus scan at any scale.  Stopword
profiles are literal arrays baked into the plan (a few hundred bytes),
not broadcast variables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language scorer.  A production deployment swaps in real profiles
# (e.g. 200 top words per language) — same plan shape.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "les", "des", "en"),
    "de": ("der", "die", "das", "und", "ein", "in", "zu", "den"),
}

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish: letters | digits | other


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), r"\s+")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document quality columns: n_tokens, n_chars,
    avg_token_len, unique_token_ratio, stopword_ratio, digit_ratio,
    and a composite quality_score in [0, 1]."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"])))
    n_chars = F.length(F.col(text_col))
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_text", n_chars)
        .withColumn(
            "avg_token_len",
            F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
        )
        .withColumn(
            "unique_token_ratio",
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
        )
        .withColumn(
            "stopword_ratio",
            stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)),
        )
        .withColumn(
            "digit_ratio",
            (
                n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
            ).cast("double")
            / F.greatest(n_chars, F.lit(1)),
        )
    )
    # Composite score: length sweet spot × diversity × not-all-digits
    score = (
        F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0))
        * F.col("unique_token_ratio")
        * (1 - F.col("digit_ratio"))
    )
    return out.withColumn("quality_score", F.round(score, 6))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one hit-ratio column per language profile plus the
    argmax `lang_pred` (ties broken by language code order)."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))

    def hit_filter(words: tuple[str, ...]):
        # NB: a `lambda t, w=words:` default arg would make PySpark see
        # a binary lambda and bind the array INDEX to w.
        return lambda t: t.isin(*words)

    out = df
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, hit_filter(words)))
        out = out.withColumn(f"score_{lang}", hits.cast("double") / n)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in LANG_PROFILES
        ]
    )
    best = F.array_max(pairs)
    return out.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unk")),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append whitespace and BPE-ish token counts (the per-doc cost
    estimate every training pipeline needs)."""
    return df.withColumn("ws_tokens", F.size(_tokens(text_col))).withColumn(
        "bpe_ish_tokens",
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_REGEX}', 0)")),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append an order-insensitive content fingerprint (md5 of sorted
    distinct tokens) — the cheap pre-filter before pairwise near-dup
    work."""
    return df.withColumn(
        "fingerprint",
        F.md5(
            F.array_join(F.sort_array(F.array_distinct(_tokens(text_col))), " ")
        ),
    )


# PII patterns kept RE2-compatible (portable across Java regex / RE2 /
# DuckDB) — no backrefs, no lookarounds.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a ``redacted`` column with emails/phones/SSNs masked and
    one ``n_<kind>`` match-count column per pattern.  Order matters:
    phone (3-3-4) is applied before SSN (3-2-4) so neither eats the
    other's digits.  Pure regexp expressions — per-row map stage."""
    red = F.col(text_col)
    out = df
    for kind, (pat, token) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


def rolling_hashes(
    df: DataFrame, text_col: str = "text", window: int = 8, base: int = 257
) -> DataFrame:
    """Append polynomial rolling hashes over token windows
    (winnowing-style document fingerprints): array of one 64-bit hash
    per window position.  Integer-only arithmetic, expression-level."""
    toks = _tokens(text_col)
    return df.withColumn(
        "rolling_hashes",
        F.expr(
            f"""
            transform(
              sequence(1, greatest(size(split({text_col}, '\\\\s+')) - {window - 1}, 0)),
              i -> aggregate(
                     slice(split({text_col}, '\\\\s+'), i, {window}),
                     0L,
                     (acc, t) -> acc * {base} + xxhash64(t) % 1000003)
            )
            """
        ),
    ).withColumn(
        "rolling_hashes",
        F.when(F.size(toks) >= window, F.col("rolling_hashes")).otherwise(
            F.array().cast("array<bigint>")
        ),
    )
