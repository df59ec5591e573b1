"""Byte-pair encoding with LEARNED merges, trained distributed.

`text.bpe_ish_token_count` approximates tokenizer load with a fixed
regex; this module trains an actual BPE merge table (Sennrich et al.
2016) on the corpus and applies it — the real "how many tokens will
the tokenizer emit" answer a training-data budget needs.

Determinism contract (what makes the unrolled SQL replay exact):

- words are whitespace tokens of the normalized text; the working
  representation is the '·'-delimited symbol string ``·l·o·w·`` (the
  corpus is charset-checked ASCII, so the delimiter cannot collide);
- each round's winning pair maximizes summed word-frequency count,
  ties broken by (left, right) text order;
- a merge is APPLIED with plain (non-regex) string replace
  ``·a·b· → ·ab·`` iterated ``passes`` times — replace is
  left-to-right non-overlapping in every engine, and iterating it to
  the (bounded: word length) fixpoint reproduces BPE's
  merge-all-occurrences semantics, identically in Spark and SQL;
- when no pair remains the state is a fixpoint and remaining rounds
  are no-ops (the replay LEFT-JOINs the empty winner and keeps seq).

Scale shape (100 TB lens): training runs on the DISTINCT-word
frequency table — vocabulary-sized, not corpus-sized — so each of the
``n_merges`` rounds is one partial-aggregable pair-count groupBy over
the exploded adjacent pairs + one TakeOrdered(1) + a narrow
column-expression rewrite (no UDF anywhere); the driver receives ONE
row per round. Each round is localCheckpoint-ed to truncate the
growing replace-expression lineage. Application to the corpus is pure
string expressions (whole-stage codegen), cost linear in text size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thoth_spark.operators.text import tokens

DELIM = "·"


def delimited(col: Column) -> Column:
    """``"low"`` → ``"·l·o·w·"`` — one symbol per character."""
    return F.concat(F.lit(DELIM), F.regexp_replace(col, "(.)", "$1" + DELIM))


def _apply_merge(seq: Column, left: str, right: str, passes: int) -> Column:
    pat = F.lit(f"{DELIM}{left}{DELIM}{right}{DELIM}")
    rep = F.lit(f"{DELIM}{left}{right}{DELIM}")
    for _ in range(passes):
        seq = F.replace(seq, pat, rep)
    return seq


def _adjacent_pairs(seq: Column) -> Column:
    """Adjacent symbol pairs of a delimited string as an array of
    (a, b) structs; empty for single-symbol words."""
    arr = F.split(seq, DELIM)  # ['', s1, ..., sk, '']
    k1 = F.size(arr) - 3  # k-1 pairs
    return F.zip_with(
        F.slice(arr, 2, F.greatest(k1, F.lit(0))),
        F.slice(arr, 3, F.greatest(k1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    passes: int = 6,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ranked ``[(left, right), ...]`` merge table (driver-side — it IS
    the model, a few KB)."""
    cur = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(delimited(F.col("w")).alias("seq"), "c")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            cur.select("c", F.explode(_adjacent_pairs(F.col("seq"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b))
        cur = cur.select(
            _apply_merge(F.col("seq"), a, b, passes).alias("seq"), "c"
        ).localCheckpoint()
    return merges


def bpe_apply(col: Column, merges: list[tuple[str, str]], passes: int = 6) -> Column:
    """Apply a ranked merge table to ONE word column (delimited form in,
    delimited form out)."""
    seq = delimited(col)
    for a, b in merges:
        seq = _apply_merge(seq, a, b, passes)
    return seq


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    passes: int = 6,
) -> DataFrame:
    """Per-document BPE token count under the learned merge table:
    explode words, apply merges (pure string expressions), count
    symbols, sum per doc. Returns ``(id_col, n_bpe)``."""
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    applied = words.select(
        id_col, bpe_apply(F.col("w"), merges, passes).alias("seq")
    )
    # '·ab·c·'.split('·') = ['', 'ab', 'c', ''] → symbols = size - 2
    n = F.size(F.split(F.col("seq"), DELIM)) - 2
    return (
        applied.select(id_col, n.alias("n"))
        .groupBy(id_col)
        .agg(F.sum("n").alias("n_bpe"))
    )
