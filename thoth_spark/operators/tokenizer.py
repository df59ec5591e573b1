"""Byte-pair encoding with LEARNED merges, trained distributed.

`text.bpe_ish_token_count` approximates tokenizer load with a fixed
regex; this module trains an actual BPE merge table (Sennrich et al.
2016) on the corpus and applies it — the real "how many tokens will
the tokenizer emit" answer a training-data budget needs.

Determinism contract (what makes the unrolled SQL replay exact):

- words are whitespace tokens of the normalized text; the working
  representation wraps EVERY symbol in its own delimiters:
  ``"low"`` → ``·l··o··w·`` (the corpus is charset-checked ASCII, so
  the delimiter cannot collide);
- each round's winning pair maximizes summed word-frequency count,
  ties broken by (left, right) text order;
- a merge is APPLIED with ONE plain (non-regex) string replace
  ``·a··b· → ·ab·``. Because each symbol carries both of its own
  delimiters, adjacent merge sites share no characters, so a single
  left-to-right non-overlapping replace IS greedy BPE merge
  application ("aaaaa" → [aa, aa, a]), identically in Spark and SQL.
  (The previous shared-delimiter encoding ``·a·b·`` consumed the
  boundary ``·`` between adjacent occurrences, skipping every second
  merge site in runs ≥ 5 of the same symbol — r10 advice.) One pass
  is also a fixpoint: a merge can never re-enable itself, since the
  merged symbol ``ab`` differs from both ``a`` and ``b``, so the only
  new adjacencies it creates are (neighbor, ab) and (ab, neighbor);
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
    """``"low"`` → ``"·l··o··w·"`` — every symbol wrapped in its own
    delimiter pair, so merge sites never share a boundary character."""
    return F.regexp_replace(col, "(.)", DELIM + "$1" + DELIM)


def _apply_merge(seq: Column, left: str, right: str) -> Column:
    """One non-overlapping literal replace = one greedy left-to-right
    BPE merge application (see module docstring for why one pass is
    exact and a fixpoint)."""
    pat = F.lit(f"{DELIM}{left}{DELIM}{DELIM}{right}{DELIM}")
    rep = F.lit(f"{DELIM}{left}{right}{DELIM}")
    return F.replace(seq, pat, rep)


def _symbols(seq: Column) -> Column:
    """Symbol array of a wrapped string: split on the delimiter and
    drop the empty boundary slots (symbols are never empty and never
    contain the delimiter)."""
    return F.filter(F.split(seq, DELIM), lambda s: s != F.lit(""))


def _adjacent_pairs(seq: Column) -> Column:
    """Adjacent symbol pairs of a wrapped string as an array of
    (a, b) structs; empty for single-symbol words."""
    syms = _symbols(seq)
    k1 = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, k1),
        F.slice(syms, 2, k1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
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
            _apply_merge(F.col("seq"), a, b).alias("seq"), "c"
        ).localCheckpoint()
    return merges


def bpe_apply(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a ranked merge table to ONE word column (wrapped form in,
    wrapped form out)."""
    seq = delimited(col)
    for a, b in merges:
        seq = _apply_merge(seq, a, b)
    return seq


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token count under the learned merge table:
    explode words, apply merges (pure string expressions), count
    symbols, sum per doc. Returns ``(id_col, n_bpe)``."""
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    applied = words.select(
        id_col, bpe_apply(F.col("w"), merges).alias("seq")
    )
    n = F.size(_symbols(F.col("seq")))
    return (
        applied.select(id_col, n.alias("n"))
        .groupBy(id_col)
        .agg(F.sum("n").alias("n_bpe"))
    )
