"""N-gram language-model scoring for perplexity-based quality filtering —
the KenLM-style curation stage: train a bigram LM on (a sample of) the
corpus, score every document by average negative log-probability, drop
the tail. All pure ``pyspark.sql.functions`` expressions and joins; no
UDFs anywhere.

Scale design: the vocabulary is capped at ``vocab_size`` (out-of-vocab
tokens collapse to ``<unk>``), which bounds BOTH model tables — unigrams
≤ V rows, bigrams ≤ the corpus' distinct within-vocab bigrams (V² worst
case, corpus-bounded in practice). With the standard V of 10⁴–10⁵ the
model fits comfortably in a broadcast, so SCORING is one scan + two
broadcast joins + one regroup — no corpus-sized shuffle. TRAINING is two
count aggregations (shuffle ∝ distinct grams, map-side combined) plus a
top-V vocabulary selection whose shuffle is ∝ distinct tokens.

Probabilities use add-k smoothing over the capped vocabulary:
``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·(V+1))`` (the +1 is ``<unk>``),
so unseen bigrams score finitely and the scorer works on held-out text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thoth_spark.operators.text import tokens

UNK = "<unk>"

#: Sentence/document boundary marker so the first real token is scored
#: (its bigram conditions on <s>).
BOS = "<s>"


@dataclass(frozen=True)
class BigramLM:
    """A trained bigram model: bounded unigram/bigram count tables plus
    the smoothing constants baked in at train time."""

    unigrams: DataFrame  # (w1, c1)
    bigrams: DataFrame  # (w1, w2, c12)
    vocab: DataFrame  # (token,) — the kept vocabulary, ≤ vocab_size rows
    vocab_size: int  # actual |vocab| (≤ requested), excludes <unk>/<s>
    add_k: float


def _vocab_tokens(df: DataFrame, text_col: str, vocab_size: int) -> DataFrame:
    """Top-``vocab_size`` tokens by frequency (count desc, token asc for
    a deterministic cut) — the standard frequency-capped vocabulary."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
    )


def _mapped_bigrams(df: DataFrame, id_col: str, text_col: str, vocab: DataFrame):
    """(id, w1, w2) bigrams with OOV tokens collapsed to <unk> and a BOS
    marker prepended; the vocab join is broadcast (vocab is capped)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    ).where(F.col("token") != "")
    mapped = (
        toks.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), on="token", how="left")
        .select(
            "id",
            "pos",
            F.when(F.col("__in").isNotNull(), F.col("token")).otherwise(UNK).alias("w"),
        )
    )
    seq = mapped.groupBy("id").agg(
        F.concat(
            F.array(F.lit(BOS)),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
        ).alias("ws")
    )
    # guard: a doc with no surviving tokens has ws == [<s>] and no
    # bigrams (sequence(1, 0) would count DOWN, not produce empty)
    pairs = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.struct(
                F.element_at(F.col("ws"), i).alias("w1"),
                F.element_at(F.col("ws"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return seq.select("id", F.explode(pairs).alias("bg")).select(
        "id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    add_k: float = 0.5,
) -> BigramLM:
    """Count-based bigram LM over a frequency-capped vocabulary. The
    corpus is tokenized twice (vocab pass, bigram pass) but each model
    table is built exactly once: the vocabulary is pinned behind a
    ``localCheckpoint`` (≤ ``vocab_size`` rows) so ``|vocab|`` and the
    OOV-mapping broadcast never re-run the corpus-wide top-V
    aggregation, the bigram table is pinned the same way (bounded — it
    must fit a broadcast at scoring time anyway), and the unigram table
    rolls up from it: ``c(w1) == Σ_w2 c(w1,w2)`` exactly (every bigram
    row carries a non-null w2), which replaces a second corpus-sized
    aggregation with a shuffle ∝ |bigram table| (both counts stay exact
    longs)."""
    if vocab_size <= 0 or add_k <= 0:
        raise ValueError("vocab_size and add_k must be positive")
    vocab = _vocab_tokens(df, text_col, vocab_size).localCheckpoint()
    bg = _mapped_bigrams(df, id_col, text_col, vocab)
    bigrams = (
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint()
    )
    unigrams = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    n_vocab = vocab.count()
    return BigramLM(
        unigrams=unigrams,
        bigrams=bigrams,
        vocab=vocab,
        vocab_size=n_vocab,
        add_k=add_k,
    )


def perplexity_score(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram cross-entropy and perplexity under ``lm``:
    ``(id, n_bigrams, avg_neg_log2_prob, perplexity)`` with
    ``perplexity = 2^avg_neg_log2_prob`` (lower = more natural under the
    LM; quality filtering drops the high tail).

    The scoring plan is one corpus scan + broadcast joins against the
    bounded model tables + one per-document regroup — nothing
    corpus-sized crosses the wire except the documents' own bigrams.
    """
    # Smoothing denominator counts <unk> as one extra outcome; BOS only
    # ever appears as w1, so it does not enter the outcome space.
    denom_v = lm.vocab_size + 1
    bg = _mapped_bigrams(df, id_col, text_col, lm.vocab)
    scored = (
        bg.join(F.broadcast(lm.bigrams), on=["w1", "w2"], how="left")
        .join(F.broadcast(lm.unigrams), on="w1", how="left")
        .select(
            "id",
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(lm.add_k))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(lm.add_k * denom_v))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("avg_neg_log2_prob"),
        F.pow(F.lit(2.0), F.avg("nll")).alias("perplexity"),
    )


def train_and_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50_000,
    add_k: float = 0.5,
) -> DataFrame:
    """Train on ``df`` and score ``df`` itself (the self-scoring quality
    filter) computing the mapped-bigram frame ONCE — cached and reused by
    the count aggregations and the scoring join, saving a full corpus
    re-tokenization versus ``train_bigram_lm`` + ``perplexity_score``.
    Cache the bigrams only when self-scoring the training corpus; for
    held-out scoring use the two-step API (and train on a
    ``hash_sample`` at 100 TB — the cache there would be corpus-sized)."""
    if vocab_size <= 0 or add_k <= 0:
        raise ValueError("vocab_size and add_k must be positive")
    # the vocabulary is pinned (≤ vocab_size rows) so |vocab| and the
    # OOV-mapping broadcast read it instead of re-running the corpus
    # top-V aggregation; the bigram table is pinned too (bounded — it
    # must fit the scoring broadcast anyway) so its broadcast build and
    # the unigram rollup share one materialization
    vocab = _vocab_tokens(df, text_col, vocab_size).localCheckpoint()
    bg = _mapped_bigrams(df, id_col, text_col, vocab).cache()
    bigrams = (
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint()
    )
    # c(w1) == Σ_w2 c(w1,w2) exactly (every bigram row has a non-null
    # w2), so the unigram table rolls up from the BOUNDED bigram table
    # instead of re-aggregating the corpus-sized bigram stream — one
    # fewer full pass over ``bg`` and a shuffle ∝ |bigram table| rather
    # than ∝ corpus bigrams (both counts stay exact longs).
    unigrams = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    denom_v = vocab.count() + 1
    scored = (
        bg.join(F.broadcast(bigrams), on=["w1", "w2"], how="left")
        .join(F.broadcast(unigrams), on="w1", how="left")
        .select(
            "id",
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k * denom_v))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("nll").alias("avg_neg_log2_prob"),
        F.pow(F.lit(2.0), F.avg("nll")).alias("perplexity"),
    )
