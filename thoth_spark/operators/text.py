"""Text analysis operators — all pure ``pyspark.sql.functions`` column
expressions (JVM-side, codegen'd; no UDFs), so they run at full scan speed
over 100 TB of documents and are reproducible in any ANSI-SQL oracle.

Hash-based operators use MD5 (not xxhash) so results are bit-identical
across engines — the deliberate trade for verifiability; swap
``F.xxhash64`` in where cross-engine determinism isn't needed and speed
matters.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W
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
    """Whitespace tokenization of the normalized text.

    Split on ``\\s+`` directly instead of ``split(normalize(col), " ")``
    — one regex pass over the text rather than a collapse-then-split
    pair, ~30% off every tokenize (verified token-array-identical over
    the whole corpus INCLUDING the empty leading/trailing tokens
    around untrimmed ``\\n``/``\\t``, which ``F.trim`` leaves in place
    on both forms)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


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
    array when the text has fewer than n tokens.

    SCALE WARNING: as a single inline expression the ``tokens(col)``
    split/regexp chain sits INSIDE the transform lambda, so Catalyst
    re-evaluates the tokenization per gram position — fine for small or
    per-row-cheap frames (the contamination benchmark side), ~10× slow
    on a corpus (measured 3.4 s vs 0.3 s staged at sf0.1). Corpus-side
    callers should use :func:`ngram_stream` instead, which materializes
    the token array behind a barrier first (the shingle_sets recipe)."""
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    distinct: bool = False,
) -> DataFrame:
    """Exploded word n-grams ``(id, g)`` computed in STAGES: tokenize →
    repartition barrier (materializes the token array as an attribute) →
    gram transform → lazy localCheckpoint → explode.

    Two distinct pathologies make the naive
    ``select(explode(word_ngrams(text)))`` ~10× slower on a corpus, both
    measured at sf0.1:

    - projection collapse inlines the tokenize chain into the gram
      lambda (re-tokenizing per position) — the barrier before the
      transform fixes it (same recipe as ``dedup.shingle_sets``);
    - exploding a higher-order-function-computed array inside Generate
      drops out of whole-stage codegen — the checkpoint before the
      explode fixes that (3.8 s → 0.5 s on the shingle frame).

    The checkpoint stores one array row per document on executor-local
    disk — the same volume the explode emits, the price of the barrier.
    Docs with fewer than ``n`` tokens contribute no rows."""
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .where(F.size("__toks") >= n)
        .repartition("id")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice("__toks", i, n)),
    )
    arr = F.array_distinct(grams) if distinct else grams
    staged = toks.select("id", arr.alias("__g")).localCheckpoint(eager=False)
    return staged.select("id", F.explode("__g").alias("g"))


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


#: (category, RE2-safe pattern, replacement token) — applied IN ORDER
#: (ipv4 before phone: dotted number runs would otherwise half-match the
#: phone pattern). RE2-safe = no lookaround/backrefs, so Spark's Java
#: regex and any RE2 oracle (DuckDB) match identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub common PII shapes (emails, IPv4s, SSNs, phone numbers) with
    typed placeholder tokens — the standard pre-training privacy pass.

    Adds ``<text_col>_redacted`` plus one ``n_<category>`` count per
    pattern. Patterns apply sequentially; each count is measured on the
    text as it stood when that pattern ran, so counts always reconcile
    with the replacements actually made. Pure regexp expressions — full
    scan speed, no shuffle, replayable in an ANSI oracle."""
    cur = F.col(text_col)
    out = df
    for name, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pattern), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pattern, token)
    return out.withColumn(f"{text_col}_redacted", cur)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    training-example chunking step (stride < chunk_tokens ⇒ adjacent
    chunks share ``chunk_tokens - stride`` tokens of context).

    Emits ``(id, chunk_idx, chunk_text, n_chunk_tokens)``; a document
    shorter than one chunk yields exactly one (possibly short) chunk.
    Pure higher-order functions + one ``posexplode``-style fan-out: no
    shuffle, output rows ∝ tokens/stride."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError("stride must be <= chunk_tokens (no token may be skipped)")
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n_tok - chunk_tokens) / F.lit(stride)).cast("int")
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            F.slice(
                F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
            ).alias("__chunk"),
        )
        .select(
            "id",
            "chunk_idx",
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            F.size("__chunk").alias("n_chunk_tokens"),
        )
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    barrier: str = "cache",
) -> DataFrame:
    """Gopher-style repetition quality signals: the fraction of all word
    n-grams taken by the single most frequent n-gram (boilerplate and
    template spam score near 1). Returns ``(id, total_ngrams,
    top_ngram_count, top_ngram_ratio)``; documents with < n tokens get
    zeros. Since r14 this is a single-order projection of
    :func:`gopher_repetition`, inheriting its shuffle shape: gram
    IDENTITIES (xxhash64) over the cached id-partitioned token barrier,
    so the gram volume never crosses the wire (the pre-r14 version
    shuffled the exploded gram strings).

    NOTE on ``barrier``: the default ``"cache"`` registers one
    CacheManager entry per distinct input DataFrame that lives until
    the session ends — right for batch jobs, wrong for UNBOUNDED
    callers (a long-lived service scoring many corpora, a foreachBatch
    trigger). Those should pass ``barrier="checkpoint"``
    (GC-reclaimed localCheckpoint, at the cost of re-shuffling the
    gram volume) — the same trade :func:`gopher_repetition` documents."""
    out = gopher_repetition(df, id_col, text_col, ns=(n,), barrier=barrier)
    return out.select(
        "id",
        "total_ngrams",
        F.col("top_count").alias("top_ngram_count"),
        F.col("top_ratio").alias("top_ngram_ratio"),
    )


#: Gopher repetition thresholds (Rae et al. 2021 table A1): max fraction
#: taken by the top n-gram, and max duplicate-n-gram fraction. DEVIATION,
#: stated: the paper defines these as CHARACTER fractions (chars inside
#: the most-frequent / inside duplicate n-grams over doc chars); this
#: engine applies them to n-gram OCCURRENCE fractions, which needs no
#: per-gram length bookkeeping and keeps the whole pass one partial-agg
#: chain. The operating point shifts slightly vs the cited recipe —
#: tune ``top_max``/``dup_max`` per-corpus if exact parity matters.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3, 4, 5, 10),
    char_weighted: bool = False,
    barrier: str = "cache",
) -> DataFrame:
    """Gopher repetition signals for SEVERAL n-gram orders in one
    dataflow — the template-spam / boilerplate detector that complements
    :func:`gopher_rules` (which reads per-word signals, not repetition).
    Long format, one row per ``(doc, n)``:

    ``(id, n, total_ngrams, distinct_ngrams, top_count, top_ratio,
    dup_ratio)`` where ``top_ratio`` is the most-frequent n-gram's share
    of all n-grams (Gopher's top-n-gram rule, n ∈ 2..4) and
    ``dup_ratio`` is the fraction of n-gram occurrences beyond their
    first (Gopher's duplicate-n-gram rule, n ∈ 5..10). Both are
    OCCURRENCE fractions, a stated deviation from the paper's character
    fractions — see :data:`GOPHER_TOP_NGRAM_MAX`. Docs with fewer
    than ``n`` tokens emit ``(0, 0, 0, 0.0, 0.0)`` for that n.

    ``char_weighted=True`` adds the paper's CHARACTER fractions as two
    extra columns from the same per-gram aggregate (the char mass
    ``count × len(gram)`` rides the existing partial-agg chain — no new
    shuffle): ``top_char_ratio`` = the top gram's char mass over the
    doc's token chars, and ``dup_char_ratio`` = the char mass of every
    gram seen more than once over the same denominator. One stated
    difference from Rae et al.'s footnote remains: overlapping
    occurrences are NOT de-overlapped (the paper counts each character
    once), so BOTH ratios are upper bounds and can exceed 1.0 on
    degenerate runs ("a a a a": top bigram covers 9 non-distinct chars
    over 7 coverable) — exact span-union counting would need
    per-position state the partial-agg shape cannot carry. The
    denominator is token characters plus single separating spaces
    (= what grams can ever cover), not raw text length.

    ``barrier`` picks the token-materialization mechanism: ``"cache"``
    (default) preserves the id partitioning so the gram volume never
    shuffles, but registers a CacheManager entry that lives until the
    session ends — right for batch jobs and ad-hoc sessions.
    ``"checkpoint"`` (localCheckpoint) is GC-reclaimed but erases the
    partitioning, re-shuffling the gram volume — right for UNBOUNDED
    callers like the per-micro-batch streaming twin, where one cache
    entry per trigger would accumulate forever and each batch is small
    enough that the extra shuffle is noise.

    Shape (r14 — ONE exchange total): the token arrays repartition by
    id once and are CACHED (``cache`` preserves outputPartitioning
    where ``localCheckpoint`` would erase it into an unknown-partitioned
    RDD scan — measured: the erased variant re-shuffled the exploded
    gram volume, 757 MB at the 20× probe, vs the token arrays' 56 MB);
    every order's grams then explode from the cached frame in one
    select, as (n, xxhash64(gram), len) identities rather than gram
    strings, and BOTH ``groupBy(id, ...)`` stages plus the dense-grid
    join key on id first, so HashPartitioning(id) already satisfies
    their clustering — the gram volume never crosses the wire. Wide-
    format verdicts: :func:`gopher_repetition_verdict`."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError("ns must be a non-empty tuple of positive ints")
    if barrier not in ("cache", "checkpoint"):
        raise ValueError(f"barrier must be 'cache' or 'checkpoint'; got {barrier!r}")
    # tokenize AFTER the id exchange: the shuffle then carries raw text
    # (strictly smaller than the token arrays it used to carry — the
    # arrays repeat every byte of the text plus per-element overhead),
    # and the regexp split runs at shuffle-partition parallelism instead
    # of input-split parallelism — the streaming twin's micro-batches
    # arrive in 1-2 source splits, which serialized the tokenize. The
    # barrier below still materializes ``__toks`` (the cache/checkpoint
    # captures the post-exchange projection), so the gram lambdas keep
    # reading a concrete column, and the barrier's HashPartitioning(id)
    # is untouched.
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__txt"))
        .repartition("id")
        .select("id", tokens(F.col("__txt")).alias("__toks"))
    )
    toks = toks.cache() if barrier == "cache" else toks.localCheckpoint(eager=False)
    def _grams(n: int) -> Column:
        # a plain 1-arg lambda: F.transform dispatches on lambda ARITY,
        # so a `lambda i, n=n` default-capture would receive the element
        # index as its second argument in place of the captured n
        return F.when(
            F.size("__toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__toks", i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # r14 shuffle shape (measured on the 20× probe, 5 orders, 100k
    # docs: 757 MB gram-string shuffle → token-array shuffle only):
    # 1. gram IDENTITIES, not gram strings, enter the aggregate — the
    #    ratios only need counts per DISTINCT gram, so each gram
    #    becomes (n, xxhash64(gram), len(gram)). A cross-gram 64-bit
    #    collision within one (doc, n) merges two counts; at 10⁶
    #    grams/doc the per-doc odds are ~3·10⁻⁸ — far below the
    #    signal's meaning. The DuckDB oracle keeps grouping by the
    #    strings and stays value-identical.
    # 2. EVERY order explodes in ONE select from the id-partitioned
    #    token frame (flatten of per-order struct arrays, not a union
    #    of legs): both downstream groupBys key on id first, so
    #    HashPartitioning(id) from the barrier above already satisfies
    #    their clustering and the exploded gram volume never crosses
    #    the wire — the only exchange left is the token-array
    #    repartition (plan-locked).
    def _leg(n: int) -> Column:
        # 1-arg lambda (see _grams); n is captured by _leg's scope
        return F.transform(
            _grams(n),
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"),
                F.xxhash64(g).alias("gh"),
                F.length(g).cast("long").alias("glen"),
            ),
        )

    exploded = toks.select(
        "id",
        F.explode(
            F.flatten(F.array(*[_leg(n) for n in sorted(set(ns))]))
        ).alias("p"),
    ).select("id", "p.n", "p.gh", "p.glen")
    per_gram_aggs = [F.count(F.lit(1)).alias("c")]
    if char_weighted:
        per_gram_aggs.append(F.max("glen").alias("glen"))
    per_gram = exploded.groupBy("id", "n", "gh").agg(*per_gram_aggs)
    per_doc_aggs = [
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.max("c").alias("top_count"),
    ]
    if char_weighted:
        # char mass = count × len(gram); the top gram is chosen by
        # count with char-mass tiebreak (struct max compares fields in
        # order), so the ratio is deterministic under count ties
        mass = (F.col("c") * F.col("glen")).cast("long")
        per_doc_aggs.append(
            F.max(F.struct(F.col("c").alias("c"), mass.alias("m")))["m"].alias(
                "top_char_mass"
            )
        )
        per_doc_aggs.append(
            F.sum(F.when(F.col("c") > 1, mass).otherwise(F.lit(0))).alias(
                "dup_char_mass"
            )
        )
    per_doc = per_gram.groupBy("id", "n").agg(*per_doc_aggs)
    # dense (doc, n) grid from the one-row-per-doc token frame (docs too
    # short for an order still emit that order's zero row) — never a
    # distinct over the exploded gram volume
    grid_cols = [
        F.col("id"),
        F.explode(F.array(*[F.lit(n) for n in sorted(set(ns))])).alias("n"),
    ]
    if char_weighted:
        # the coverable denominator: token chars + single joining spaces
        grid_cols.append(
            F.greatest(
                F.aggregate(
                    "__toks",
                    F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t),
                )
                + F.size("__toks")
                - 1,
                F.lit(0).cast("long"),
            ).alias("doc_chars")
        )
    grid = toks.select(*grid_cols)
    out_cols = [
        F.col("id"),
        F.col("n"),
        F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
        F.coalesce("distinct_ngrams", F.lit(0)).alias("distinct_ngrams"),
        F.coalesce("top_count", F.lit(0)).alias("top_count"),
        F.round(
            F.coalesce(F.col("top_count") / F.col("total_ngrams"), F.lit(0.0)), 6
        ).alias("top_ratio"),
        F.round(
            F.coalesce(
                (F.col("total_ngrams") - F.col("distinct_ngrams"))
                / F.col("total_ngrams"),
                F.lit(0.0),
            ),
            6,
        ).alias("dup_ratio"),
    ]
    if char_weighted:
        out_cols.append(
            F.round(
                F.coalesce(
                    F.col("top_char_mass") / F.col("doc_chars"), F.lit(0.0)
                ),
                6,
            ).alias("top_char_ratio")
        )
        out_cols.append(
            F.round(
                F.coalesce(
                    F.col("dup_char_mass") / F.col("doc_chars"), F.lit(0.0)
                ),
                6,
            ).alias("dup_char_ratio")
        )
    return grid.join(per_doc, on=["id", "n"], how="left").select(*out_cols)


def gopher_repetition_verdict(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_max: dict[int, float] | None = None,
    dup_max: dict[int, float] | None = None,
    max_dup_line_ratio: float = 0.30,
    max_dup_line_char_ratio: float = 0.20,
    barrier: str = "cache",
) -> DataFrame:
    """Wide per-document Gopher repetition verdict: pivots
    :func:`gopher_repetition` over the rule orders and adds the two
    line-level signals (fraction of repeated lines; fraction of
    characters in repeated lines) — ``pass_repetition`` is True iff
    every configured threshold holds. Line signals are one map-side
    expression (distinct-vs-total over the split line array); the pivot
    is a conditional agg over the long frame, so the whole verdict costs
    the long pass plus one ``groupBy(id)``. ``barrier`` passes through
    to :func:`gopher_repetition` — unbounded callers (per-micro-batch
    streaming) should use ``"checkpoint"`` to avoid session-lifetime
    cache accumulation."""
    top_max = GOPHER_TOP_NGRAM_MAX if top_max is None else top_max
    dup_max = GOPHER_DUP_NGRAM_MAX if dup_max is None else dup_max
    ns = tuple(sorted(set(top_max) | set(dup_max)))
    long = gopher_repetition(df, id_col, text_col, ns=ns, barrier=barrier)
    aggs = []
    for n in sorted(top_max):
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("top_ratio"))).alias(
                f"top_{n}gram_ratio"
            )
        )
    for n in sorted(dup_max):
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("dup_ratio"))).alias(
                f"dup_{n}gram_ratio"
            )
        )
    wide = long.groupBy("id").agg(*aggs)
    # blank separator lines are layout, not repetition: a ten-paragraph
    # document joined with '\n\n' must not fail the duplicate-line rule
    # on its nine identical empty separators, so only lines with content
    # enter both line signals (whitespace-only lines would likewise be
    # counted as duplicate chars by the raw split)
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != F.lit("")
    )
    n_lines = F.size(lines)
    dup_line_ratio = F.round(
        F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines))).cast("double")
            / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, l: acc + F.length(l),
    )
    dup_line_char_ratio = F.round(
        F.when(
            line_chars > 0,
            (line_chars - distinct_line_chars).cast("double") / line_chars,
        ).otherwise(F.lit(0.0)),
        6,
    )
    base = df.select(
        F.col(id_col).alias("id"),
        dup_line_ratio.alias("dup_line_ratio"),
        dup_line_char_ratio.alias("dup_line_char_ratio"),
    )
    out = base.join(wide, on="id", how="left")
    verdict = (F.col("dup_line_ratio") <= max_dup_line_ratio) & (
        F.col("dup_line_char_ratio") <= max_dup_line_char_ratio
    )
    for n, t in sorted(top_max.items()):
        verdict = verdict & (F.col(f"top_{n}gram_ratio") <= t)
    for n, t in sorted(dup_max.items()):
        verdict = verdict & (F.col(f"dup_{n}gram_ratio") <= t)
    return out.withColumn("pass_repetition", verdict)


def contamination_check(
    df: DataFrame,
    benchmark_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination screen: per document, the fraction of its
    distinct word n-grams that also occur anywhere in ``benchmark_df`` —
    the standard eval-set leak detector for training corpora.

    Returns ``(id, n_shingles, n_matched, contamination)``. The
    benchmark's distinct shingle set is broadcast (eval sets are tiny
    next to the corpus); the corpus side is one explode + one
    groupBy(id) — never corpus × benchmark rows."""
    benchmark_text_col = benchmark_text_col or text_col
    bench = (
        benchmark_df.select(
            F.explode(word_ngrams(F.col(benchmark_text_col), n)).alias("g")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # staged (barrier + checkpoint) explode on the CORPUS side; the
    # benchmark side above stays inline — it is eval-set-sized
    doc_shingles = ngram_stream(df, id_col, text_col, n, distinct=True)
    joined = doc_shingles.join(F.broadcast(bench), on="g", how="left")
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_matched"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(per_doc, on="id", how="left").select(
        "id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        F.coalesce(F.col("n_matched") / F.col("n_shingles"), F.lit(0.0)).alias(
            "contamination"
        ),
    )


#: The stop-list used by the Gopher "contains ≥2 stop words" rule
#: (Rae et al. 2021, appendix A1.1). Fixed and tiny by design — the rule
#: tests for the PRESENCE of common function words, not a stopword rate.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Line prefixes the bullet-ratio rule counts as bullets.
GOPHER_BULLETS = ["-", "*", "•"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 §A1.1) as one
    map-side column pass — the standard heuristic gate a web corpus goes
    through before dedup/classifier stages. Per document:

    - ``n_words`` in ``[min_words, max_words]``;
    - mean word length in ``[min_avg_word_len, max_avg_word_len]``;
    - symbol-to-word ratios at most ``max_symbol_word_ratio`` EACH, the
      way the paper states the rule ("either the hash symbol or the
      ellipsis"): ``hash_word_ratio`` (``#`` chars per word) and
      ``ellipsis_word_ratio`` (``...`` runs plus ``…`` chars per word)
      are separate signals gated separately — a combined sum would be
      strictly tighter than the cited recipe;
    - at most ``max_bullet_ratio`` of lines starting with a bullet and
      ``max_ellipsis_ratio`` of lines ending with an ellipsis (ASCII
      ``...`` or unicode ``…``);
    - at least ``min_alpha_word_ratio`` of words containing a letter;
    - at least ``min_stop_hits`` distinct :data:`GOPHER_STOPWORDS`.

    Returns one row per input row with the measured signals (ratios
    rounded to 6) and a ``pass_gopher`` verdict; filtering is the
    caller's ``WHERE pass_gopher`` so rejected docs stay inspectable.
    Pure built-in expressions — no UDF, no shuffle, SQL-replayable —
    so the pass runs at scan speed over any corpus size."""
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_word_len = sum_len.cast("double") / n_words
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3 + (F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit(""))))
    hash_word_ratio = n_hash.cast("double") / n_words
    ellipsis_word_ratio = n_ellipsis.cast("double") / n_words
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet_arr = F.array(*[F.lit(b) for b in GOPHER_BULLETS])
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.array_contains(
                    bullet_arr, F.substring(F.ltrim(l), 1, 1)
                ),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.endswith(F.rtrim(l), F.lit("..."))
                | F.endswith(F.rtrim(l), F.lit("…")),
            )
        )
        .cast("double")
        / n_lines
    )
    alpha_word_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / n_words
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    out = df.withColumns(
        {
            "n_words": n_words,
            "avg_word_len": F.round(avg_word_len, 6),
            "hash_word_ratio": F.round(hash_word_ratio, 6),
            "ellipsis_word_ratio": F.round(ellipsis_word_ratio, 6),
            "bullet_ratio": F.round(bullet_ratio, 6),
            "ellipsis_ratio": F.round(ellipsis_ratio, 6),
            "alpha_word_ratio": F.round(alpha_word_ratio, 6),
            "stop_hits": stop_hits,
        }
    )
    verdict = (
        F.col("n_words").between(min_words, max_words)
        & F.col("avg_word_len").between(min_avg_word_len, max_avg_word_len)
        & (F.col("hash_word_ratio") <= max_symbol_word_ratio)
        & (F.col("ellipsis_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("pass_gopher", verdict)


#: line-level policy substrings the C4 recipe drops (cookie banners,
#: boilerplate legal links) — Raffel et al. 2020 §2.2's cleanup as
#: popularized by the C4/RefinedWeb reimplementations.
C4_POLICY_SUBSTRINGS = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
]

#: characters C4 accepts as a terminal line ending.
C4_TERMINAL_PUNCT = [".", "!", "?", '"']


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """The C4 cleaning recipe (Raffel et al. 2020 §2.2) as one map-side
    column pass — the other canonical web-corpus gate next to
    :func:`gopher_rules`. Defaults follow the paper TEXT: "We discarded
    any page with fewer than 5 sentences and only retained lines that
    contained at least 3 words" (§2.2). Note the released TFDS
    ``c4_utils`` constants differ from the paper's own prose
    (``_MIN_WORDS_PER_LINE = 5``) — a known text-vs-code discrepancy in
    the original; callers wanting parity with the RELEASED pipeline
    rather than the paper should pass ``min_line_words=5``. Line level,
    a line survives iff it

    - ends in terminal punctuation (``. ! ? "``),
    - has at least ``min_line_words`` words (paper: 3),
    - does not mention ``javascript`` (case-insensitive), and
    - carries none of :data:`C4_POLICY_SUBSTRINGS`;

    document level, ``pass_c4`` then requires at least
    ``min_sentences`` sentences (paper: 5) in the KEPT text
    (terminal-punctuation count as the sentence proxy — no NLTK
    dependency), no ``lorem ipsum``, and no ``{`` anywhere (the
    code-page tell).

    Returns every input row with ``kept_text`` (surviving lines
    TRIMMED, as upstream C4 does, and joined by newline), the measured
    signals (``n_lines``, ``n_kept_lines``, ``n_sentences``,
    ``has_lorem_ipsum``, ``has_brace``) and the verdict — filtering is
    the caller's ``WHERE pass_c4`` so rejected docs stay inspectable.
    Pure built-in higher-order expressions: no UDF, no shuffle,
    SQL-replayable, scan-speed at any corpus size."""
    c = F.col(text_col)
    lower = F.lower(c)
    lines = F.split(c, "\n")
    punct_arr = F.array(*[F.lit(p) for p in C4_TERMINAL_PUNCT])

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        low = F.lower(t)
        ends_ok = F.array_contains(
            punct_arr, F.substring(t, F.length(t).cast("int"), 1)
        )
        words_ok = F.size(F.split(t, r"\s+")) >= min_line_words
        return (
            (F.length(t) > 0)
            & ends_ok
            & words_ok
            & ~low.contains("javascript")
            & ~reduce(
                lambda a, b: a | b,
                [low.contains(s) for s in C4_POLICY_SUBSTRINGS],
            )
        )

    # explicit 1-arg lambda: F.transform dispatches on callable ARITY
    # and F.trim has a deprecated 2-parameter signature — passing it
    # bare binds (element, index) and the INDEX becomes the
    # trim-character set (same footgun as gopher_repetition._grams)
    kept_lines = F.transform(F.filter(lines, _line_ok), lambda l: F.trim(l))
    kept_text = F.array_join(kept_lines, "\n")
    n_sentences = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, r"[.!?]", "")
    )
    out = df.withColumns(
        {
            "kept_text": kept_text,
            "n_lines": F.size(lines),
            "n_kept_lines": F.size(kept_lines),
            "n_sentences": n_sentences,
            "has_lorem_ipsum": lower.contains("lorem ipsum"),
            "has_brace": c.contains("{"),
        }
    )
    verdict = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace")
    )
    return out.withColumn("pass_c4", verdict)


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


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every
    word ``k``-gram, slide a window of ``window`` consecutive hashes,
    and select each window's MINIMUM hash — the selected ``(pos, fp)``
    set is a position-aware document fingerprint with the winnowing
    guarantee (any shared run of ``k + window - 1`` tokens yields at
    least one shared fingerprint). Returns ``(id, pos, fp)`` distinct.

    Within-window ties take the FIRST position of the minimum (with
    32-bit gram hashes, in-window ties are ~2⁻³² per window — the
    classic rightmost-rule robustness is irrelevant at that rate, and
    first-position is what both Spark ``array_position`` and DuckDB
    ``list_position`` compute, keeping the op SQL-replayable).

    Same staging recipe as :func:`ngram_stream` (tokenize → repartition
    barrier → hash-array transform → lazy checkpoint → window select):
    pure column expressions, one narrow pass, the only shuffle is the
    repartition barrier. Docs with fewer than ``k`` tokens contribute
    nothing; docs with fewer than ``window`` grams contribute the
    minimum of their single clamped window.
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, window={window}")
    toks = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
        .where(F.size("__toks") >= k)
        .repartition("id")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("__toks", i, k))), 1, 8),
            16,
            10,
        ).cast("long"),
    )
    staged = toks.select("id", grams.alias("__h")).localCheckpoint(eager=False)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size("__h") - (window - 1))
    )
    def _sel(s):
        win = F.slice(F.col("__h"), s, window)
        minv = F.array_min(win)
        return F.struct(
            (s + F.array_position(win, minv) - 1).cast("int").alias("pos"),
            minv.alias("fp"),
        )
    return (
        staged.select("id", F.explode(F.transform(starts, _sel)).alias("w"))
        .select("id", "w.pos", "w.fp")
        .distinct()
    )


def winnow_overlap_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    hot_cap: int | None = 200,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` distinct winnowing
    fingerprints — the MOSS plagiarism-pair report as a posting-list
    self-join (the same inverted-index + hot-key-cap shape as the n-gram
    Jaccard and video frame-hash paths: fingerprints present in more
    than ``hot_cap`` documents are boilerplate and dropped before the
    join). Input is :func:`winnow_fingerprints` output; returns
    ``(id_a, id_b, shared_fps)``."""
    posting = fps.select("id", "fp").distinct().localCheckpoint(eager=False)
    if hot_cap is not None:
        hot = (
            posting.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > hot_cap)
            .select("fp")
        )
        posting = posting.join(F.broadcast(hot), "fp", "left_anti")
    a = posting.alias("a")
    b = posting.alias("b")
    return (
        a.join(b, on="fp")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def vocabulary(
    df: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Corpus token vocabulary: the ``top_n`` most frequent whitespace
    tokens with count and CUMULATIVE corpus-coverage share — the table
    every tokenizer-training / stopword / vocab-truncation decision
    reads first ("how many tokens cover 95% of the corpus?").

    Returns ``(rank, tok, cnt, coverage)``; rank ties break on token
    text, coverage = running sum of cnt over rank / total corpus
    tokens (ALL tokens, not just the listed ones), rounded 6.

    Scale shape: one explode + one partial-aggregable token-count
    groupBy (the only corpus-sized shuffle), then the top-N is a
    TakeOrdered — never a global sort — and the running-sum window
    runs over ≤ top_n rows. The total-token denominator folds into the
    same count pass via a scalar aggregate (broadcast one-row join)."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("__total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(top_n)
    w = W.orderBy(F.col("cnt").desc(), F.col("tok"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "tok",
            "cnt",
            F.round(
                F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, 0))
                / F.col("__total"),
                6,
            ).alias("coverage"),
        )
    )
