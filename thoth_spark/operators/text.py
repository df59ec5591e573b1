"""Text analysis operators — all pure ``pyspark.sql.functions`` column
expressions (JVM-side, codegen'd; no UDFs), so they run at full scan speed
over 100 TB of documents and are reproducible in any ANSI-SQL oracle.

Hash-based operators use MD5 (not xxhash) so results are bit-identical
across engines — the deliberate trade for verifiability; swap
``F.xxhash64`` in where cross-engine determinism isn't needed and speed
matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "es": [" el ", " la ", " los ", " que ", " es "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " les ", " est ", " dans "],
    "zh": ["的", "是", "在", "了"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def normalize(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprinting and shingling."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalize(col), " ")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation runs
    (a cheap regex proxy for BPE token counts)."""
    return F.size(
        F.filter(
            F.split(F.trim(col), r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) of the normalized text; empty
    array when the text has fewer than n tokens."""
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(col))


def _count_occurrences(col: Column, needle: str) -> Column:
    """#occurrences of a literal substring — (len - len(replace))/len(needle),
    identical semantics in any SQL engine."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def language_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Marker-lexicon language ID: the language whose markers occur most
    often in the padded lowercase text; ties resolve to the alphabetically
    first language; 'und' when no marker hits."""
    markers = markers or LANG_MARKERS
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    items = sorted(markers.items())
    scores = [
        sum((_count_occurrences(padded, m) for m in ms[1:]), _count_occurrences(padded, ms[0]))
        for _, ms in items
    ]
    # argmax via array_max over (score, -index) structs: one evaluation of
    # each score expression, vs. a when-cascade that re-embeds every prior
    # score in each comparison (expression size grows quadratically and
    # each marker scan re-runs per nesting level). Tie → larger -index →
    # alphabetically first language.
    best = F.array_max(
        F.array(
            *[
                F.struct(s.alias("s"), F.lit(-i).alias("ni"))
                for i, s in enumerate(scores)
            ]
        )
    )
    lang_arr = F.array(*[F.lit(lang) for lang, _ in items])
    return F.when(
        best["s"] > 0, F.element_at(lang_arr, (-best["ni"]).cast("int") + 1)
    ).otherwise(F.lit("und"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics used for quality filtering."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    return df.withColumns(
        {
            "n_chars_computed": F.length(c),
            "n_tokens": n_tok,
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "avg_token_len": (F.length(normalize(c)) - (n_tok - 1)) / n_tok,
            "stopword_ratio": F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / n_tok,
            "digit_ratio": (
                F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
            )
            / F.length(c),
            "punct_ratio": (
                F.length(c)
                - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
            )
            / F.length(c),
            "upper_ratio": (
                F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
            )
            / F.length(c),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0,1]: rewards mid-length documents
    with diverse tokens and a natural stopword rate, penalizes digit/punct
    noise — the usual first-pass filter for LLM training corpora."""
    stats = text_stats(df, text_col)
    length_term = F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
    diversity_term = F.col("n_distinct_tokens") / F.col("n_tokens")
    stopword_term = F.lit(1.0) - F.abs(F.col("stopword_ratio") - 0.08) * 2
    noise_term = F.lit(1.0) - F.least(
        (F.col("digit_ratio") + F.col("punct_ratio")) * 4, F.lit(1.0)
    )
    score = (
        length_term * 0.3
        + diversity_term * 0.3
        + F.greatest(stopword_term, F.lit(0.0)) * 0.2
        + noise_term * 0.2
    )
    return stats.withColumn("quality_score", F.round(score, 6))
