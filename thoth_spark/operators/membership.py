"""Distributed Bloom-filter membership — the crawl-scale "seen set".

The operation a 100 TB ingest loop actually runs: an approximate
membership test of every incoming key (URL, document fingerprint,
passage hash) against a corpus-sized reference set, with NO false
negatives and a sized false-positive rate — exact-dedup and
contamination checks where materializing or joining the full reference
set per batch is too expensive.

Representation: the filter IS a DataFrame of packed bitmap words,
``(bucket BIGINT, word BIGINT)`` with 32 bits per word — at most
``m/32`` rows for an ``m``-bit filter, built by one partial-aggregable
``groupBy(bucket).bit_or(mask)`` pass over the reference corpus (map-
side combine collapses each partition to ≤ m/32 rows before the
shuffle, so build cost is one small shuffle regardless of corpus
size). Probing joins the probe keys' ``n_hashes`` positions against
the words on ``bucket`` — broadcastable while m ≤ a few billion bits
(m/32 longs ≈ 25 MB at m = 2^32); beyond that it is a shuffle join on
a uniformly distributed key, skew-free by construction. A key is a
hit iff EVERY one of its hash positions' bits is set — guaranteed
true for every key that was inserted (no false negatives); a false
positive needs all ``n_hashes`` positions colliding, probability
``(1 − e^(−kn/m))^k`` for n inserted keys (size with
``m ≈ 1.44 · k · n`` per factor-of-2 FPR reduction; the classic
optimum is ``k = (m/n)·ln 2``).

Hash positions use the repo-standard engine-portable scheme (md5 of
``key#i``, first 8 hex digits → int, mod m — the same idiom as
sampling.hash_sample and classifier.hash_features), so the whole
operator — false positives included — is deterministic and
SQL-replayable, unlike Spark's internal ``DataFrame.stat.bloomFilter``
(driver-held object, engine-private hashes, not registered as a SQL
aggregate in this build).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 32  # stay clear of the BIGINT sign bit in every engine


def hash_position(key: Column, i: int, m: int) -> Column:
    """The ``i``-th Bloom hash of ``key``: md5("key#i") first 8 hex
    digits as an integer, mod ``m``. Independent-enough per ``i`` and
    bit-identical in any engine with md5."""
    return (
        F.conv(F.substring(F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 8), 16, 10)
        .cast("long")
        % m
    )


def _bucket() -> Column:
    return (F.col("pos") / BITS_PER_WORD).cast("long")


def _mask() -> Column:
    # F.shiftleft wants a literal shift count; the SQL form takes a column
    return F.expr(
        f"shiftleft(cast(1 as bigint), cast(pos % {BITS_PER_WORD} as int))"
    )


def _positions(df: DataFrame, key_col: str, m: int, n_hashes: int) -> DataFrame:
    pos = F.explode(
        F.array(*[hash_position(F.col(key_col), i, m) for i in range(n_hashes)])
    )
    return df.select(*df.columns, pos.alias("pos"))


def bloom_build(
    df: DataFrame, key_col: str, m: int = 1 << 20, n_hashes: int = 3
) -> DataFrame:
    """Build the ``m``-bit filter over ``df[key_col]``: one
    explode(n_hashes) + one partial-aggregable bit_or groupBy.
    Returns ``(bucket, word)`` — at most ``m/32`` rows; cache or
    persist it to amortize across probe batches."""
    return (
        _positions(df.select(key_col), key_col, m, n_hashes)
        .select(_bucket().alias("bucket"), _mask().alias("mask"))
        .groupBy("bucket")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    filter_df: DataFrame,
    df: DataFrame,
    id_col: str,
    key_col: str,
    m: int = 1 << 20,
    n_hashes: int = 3,
    broadcast: bool = True,
) -> DataFrame:
    """Probe every row of ``df`` against a :func:`bloom_build` filter.
    Returns ``(id_col, hit BOOLEAN)`` — ``hit`` is true iff every hash
    position's bit is set (never false for inserted keys; false
    positives at the sized rate). ``broadcast=True`` hints the filter
    side — right up to ~10^9 bits; set False past that and the join
    shuffles on the uniform bucket key."""
    flt = F.broadcast(filter_df) if broadcast else filter_df
    probed = (
        _positions(df.select(id_col, key_col), key_col, m, n_hashes)
        .select(F.col(id_col), _bucket().alias("bucket"), _mask().alias("mask"))
        .join(flt, "bucket", "left")
        .select(
            id_col,
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("bit_set"),
        )
    )
    return probed.groupBy(id_col).agg(F.bool_and("bit_set").alias("hit"))
