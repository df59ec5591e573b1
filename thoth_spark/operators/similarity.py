"""Embedding similarity search over ``array<float>`` columns.

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the distributed corpus; dot products via
  ``zip_with``/``aggregate`` higher-order functions (JVM-side, no UDF);
  per-query ``row_number`` for the k cut. The correctness baseline.
- :func:`hyperplane_lsh_topk` — the scale path: random-hyperplane sign
  buckets shrink each query's candidate set; probing the query's bucket
  plus single-bit-flip neighbors trades recall for a corpus-size-
  independent candidate count.
- :func:`ivf_topk` — IVF: K-Means coarse quantizer (Spark MLlib), corpus
  partitioned by nearest centroid, queries probe the ``nprobe`` closest
  centroids only — the classic billion-vector layout where the centroid
  assignment doubles as the storage partition key.
- :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs via the
  same hyperplane bucketing (for embedding-level dedup).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

from thoth_spark.operators.partitioning import spread_narrow


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays — the aggregate-HOF fold.

    Deliberately NOT unrolled into a flat per-element arithmetic chain
    even where the vector length is statically known: an r16 experiment
    shipped ``dim``-unrolled dots (64-dim -> ~190 expression nodes per
    dot) across the ANN family and every touched query regressed
    1.5-2.8x on re-measurement (knn_graph 5.0s -> 14.0s, ivfpq
    2.5s -> 4.7s, decontaminate 2.2s -> 3.7s; reverting restored them).
    Same finding as the older :func:`hyperplane_signature` note — giant
    expression trees defeat codegen and fall back to interpreted
    evaluation of hundreds of nodes per row, while the fold stays one
    compact loop. Do not "optimize" this into explicit sums."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _col_type(df: DataFrame, col: str) -> str:
    """Spark simpleString type of ``col`` — the mapInPandas paths emit
    id columns with the INPUT's id type instead of a hardcoded bigint
    (r10 advice: string / non-bigint id columns silently broke)."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}[col]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    The query side is broadcast (no shuffle of the corpus); cost is one
    full corpus scan per batch of queries — run queries in batches, not
    one at a time. Excludes self-matches on id. Returns
    (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-SQ8-style per-vector int8 quantization: each component is
    rounded to ``round(x * 127 / max|x|)`` ∈ [-127, 127]; the per-vector
    ``scale`` (max|x|/127) and the EXACT float ``vnorm`` are kept so
    approximate dot products de-quantize without touching the floats.

    Why at 100 TB: a brute/IVF scan is memory-bandwidth-bound, and the
    quantized corpus is 4× smaller than float32 (8× vs double) — the
    scan reads a quarter of the bytes; exactness is recovered by
    re-ranking a small candidate pool (:func:`quantized_topk`). Pure
    column expressions (transform/aggregate) — no UDF, no shuffle."""
    vec = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col),
        F.transform(vec, lambda x: F.round(x / scale).cast("int")).alias("qvec"),
        scale.alias("scale"),
        norm(vec).alias("vnorm"),
    )


def _dequantized_cos() -> Column:
    """Approximate cosine from two SQ8 rows: integer dot product
    (components widened to int — byte×byte would overflow) de-quantized
    by the two per-vector scales, over the EXACT stored float norms.
    Expects columns ``qvec/scale/vnorm`` and ``q_qvec/q_scale/q_vnorm``.
    Fold form on purpose — see :func:`dot` (the unrolled variant
    regressed every SQ8 query 1.6-2x)."""
    idot = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("q_qvec"), lambda x, y: x.cast("int") * y.cast("int")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        idot.cast("double")
        * F.col("scale")
        * F.col("q_scale")
        / (F.col("vnorm") * F.col("q_vnorm"))
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-result cosine top-k with a quantized first pass: scan the
    int8 corpus (4× less bandwidth than floats) for approximate scores,
    keep the top ``rerank`` (default ``10*k``) candidates per query, then
    re-rank ONLY those with exact float cosine. int8 quantization error
    on unit-scale embeddings is ~1e-2 on cosine, so a 10× candidate
    margin makes the final top-k equal brute force in practice (asserted
    against :func:`brute_force_topk` in tests; the driver oracle is the
    exact-SQL top-k). The exact-vector join touches candidates only —
    O(queries × rerank) rows, never the corpus."""
    rerank = rerank or 10 * k
    qc = scalar_quantize(corpus, id_col, vec_col)
    qq = scalar_quantize(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("scale").alias("q_scale"),
        F.col("vnorm").alias("q_vnorm"),
    )
    approx = (
        qc.crossJoin(F.broadcast(qq))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("approx_cos", _dequantized_cos())
    )
    w_a = W.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col(id_col)
    )
    cands = (
        approx.withColumn("arank", F.row_number().over(w_a))
        .where(F.col("arank") <= rerank)
        .select(F.col(id_col).alias("neighbor_id"), "query_id")
    )
    exact_c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    exact_q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    rescored = (
        cands.join(exact_c, "neighbor_id")
        .join(F.broadcast(exact_q), "query_id")
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → reproducible plans
    across runs and engines)."""
    rng = np.random.RandomState(seed)
    return rng.randn(nbits, dim).tolist()


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id (int) from dot products with fixed hyperplanes —
    pure column expression; the planes ride along as ONE 2-D literal.

    Two deliberate shapes here:

    - The fold-based :func:`dot` (not an unrolled sum): a flat 64-term
      arithmetic chain (x24 signatures per row) was measured 4× SLOWER
      (20 s vs 4.5 s at sf0.1) — the giant tree blows codegen apart —
      while the lambda fold stays a compact interpreted loop.
    - ONE ``lit(planes)`` + an indexed ``transform`` fold, not a Python
      loop of per-plane ``array(lit, lit, …)`` terms: the loop form
      issued ~70 py4j round-trips per plane (64 literals + the when/dot
      wrappers), and DataFrame CONSTRUCTION — not execution — dominated
      the recall harness's wall (measured 4.8 s build vs 1.1 s run at
      sf0.1). Bit i weights its plane via ``shiftleft(1, i)`` on the
      transform index — same int arithmetic, same signature values."""
    # ONE py4j call for the whole plane matrix: classic-mode F.lit(list)
    # still issues one JVM call per element (measured: the 2×24-plane
    # construction alone was ~3 s of socket round-trips). A SQL literal
    # string parses in a single call; repr() is the shortest
    # round-trip rendering and string→double casts are correctly
    # rounded, so every coefficient lands bit-identical.
    planes_lit = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in p)
            + ")"
            for p in planes
        )
        + ")"
    )
    return F.aggregate(
        F.transform(
            planes_lit,
            lambda p, i: F.when(
                dot(vec, p) > 0,
                # 2^i as an int (pow is exact for these exponents);
                # F.shiftleft only takes a Python-int bit count, not
                # the transform index column
                F.pow(F.lit(2.0), i).cast("int"),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    probe_flips: int = 1,
) -> DataFrame:
    """Approximate cosine top-k with multi-table hyperplane LSH: ``n_tables``
    independent sign-bucket tables (different hyperplane seeds), each probed
    at the query's bucket plus ≤ ``probe_flips``-bit neighbors. Candidate
    volume ∝ corpus × n_tables × probes / 2^nbits — tunable recall/cost,
    independent of corpus² (the brute-force blowup).

    SIZE ``nbits`` TO THE CORPUS: each probe keeps ~corpus/2^nbits
    candidates, so keep ``2^nbits`` within ~3 orders of magnitude of the
    corpus size (1B vectors → nbits ≥ 20). The small default suits the
    test fixtures only.

    Pass ``dim`` explicitly in production: the ``None`` fallback reads
    one corpus row to measure the vector length — correct, but it costs
    a (small) Spark job per operator construction."""
    if dim is None:
        dim = len(corpus.select(vec_col).limit(1).collect()[0][0])

    def _bucketed(df, idc, vc, probe: bool):
        # the signature pass (n_tables aggregate-HOF dots per row) is
        # the side's per-row cost; spread a narrow scan first so the
        # checkpoint materializes at cluster parallelism (no-op at scale)
        base = spread_narrow(
            df.select(F.col(idc), _as_double(F.col(vec_col)).alias(vc)), idc
        )
        # ONE signature column per table behind the checkpoint, probe
        # buckets derived from the materialized column: inlining the
        # XOR-flip probes into the same projection used to duplicate
        # the whole (nbits × dim)-literal signature subtree per flip —
        # (1 + nbits) copies per table on the probe side, ~10k literal
        # nodes total, paid at ANALYSIS/codegen time on the driver
        # (wall far exceeded task time on this query). The XOR fan-out
        # over an attribute is a handful of integer ops.
        sig_cols = [
            hyperplane_signature(
                F.col(vc), _hyperplanes(dim, nbits, seed=42 + t)
            ).alias(f"__sig{t}")
            for t in range(n_tables)
        ]
        # the lazy checkpoint still materializes the signature pass
        # before the explode: Generate over an HOF-computed array drops
        # out of codegen (measured 4.3 s -> sub-second on the sf0.1
        # corpus side), and the probe fan-out must read sig as a
        # concrete column, not re-run the dot products per flip.
        staged = base.select(
            F.col(idc), F.col(vc), *sig_cols
        ).localCheckpoint(eager=False)
        tables = []
        for t in range(n_tables):
            sig = F.col(f"__sig{t}")
            buckets = [sig]
            if probe and probe_flips >= 1:
                buckets += [sig.bitwiseXOR(F.lit(2**i)) for i in range(nbits)]
            tables += [b + F.lit(t * 2**nbits) for b in buckets]
        return staged.withColumn("bucket", F.explode(F.array(*tables))).select(
            F.col(idc), F.col(vc), "bucket"
        )

    c = _bucketed(
        corpus.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id", "cv", probe=False
    )
    q = _bucketed(
        queries.withColumnRenamed(id_col, "query_id"), "query_id", "qv", probe=True
    )

    candidates = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "cos_sim", cosine(F.col("qv"), F.col("cv"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def coarse_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int = 42,
    max_train: int = 65536,
) -> np.ndarray:
    """K-Means coarse centroids as an ``(n_centroids, dim)`` float64
    matrix, trained on a bounded sample (``max_train`` rows, cached and
    coalesced to a few partitions) with random init — the standard IVF
    recipe: quantizer quality needs ~hundreds of points per centroid,
    not the full corpus, and k-means|| init plus per-iteration jobs over
    thousands of corpus partitions would otherwise dominate (also the
    only part of any consumer that does NOT scale with corpus size, so
    keep it small and fast). Shared by :func:`ivf_topk` and
    :func:`semdedup`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = (
        corpus.select(array_to_vector(_as_double(F.col(vec_col))).alias("features"))
        .limit(max_train)
        .coalesce(4)
        .cache()
    )
    km = KMeans(k=n_centroids, seed=seed, maxIter=10, initMode="random").fit(train)
    train.unpersist()
    return np.asarray(
        [[float(x) for x in c] for c in km.clusterCenters()], dtype=np.float64
    )


def nearest_cells_udf(cent_mat: np.ndarray, n: int):
    """Arrow-batched nearest-centroid assignment: the centroid matrix
    ships once per task in the UDF closure (a few MB even at 65k
    centroids × 128 dims), so the PLAN stays O(1) in ``n_centroids``
    — the round-4 expression-literal form inlined every centroid
    into the expression tree, which breaks codegen past a few
    hundred centroids. One BLAS matmul per Arrow batch; argmin over
    ``||x||² − 2x·c + ||c||²`` (the ``||x||²`` term is rank-
    invariant and dropped). Ties break on the lower cid via stable
    argsort, matching the struct-sort tie-break it replaces."""
    cent_sq = (cent_mat * cent_mat).sum(axis=1)  # ||c||² per centroid

    @pandas_udf(ArrayType(IntegerType()))
    def nearest_cells(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            x = np.stack(vecs.to_numpy())  # (batch, dim)
            d = cent_sq - 2.0 * (x @ cent_mat.T)  # (batch, n_centroids)
            idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
            yield pd.Series(list(idx))

    return nearest_cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 65536,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: K-Means coarse centroids
    (:func:`coarse_centroids`); corpus rows are assigned to their
    nearest centroid (this assignment is the natural storage
    partitioning key at scale — :func:`build_ivf_index` materializes
    it); each query scans only its ``nprobe`` nearest centroid cells.
    Pass ``centroids`` to reuse a trained quantizer."""
    cent_mat = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else coarse_centroids(corpus, vec_col, n_centroids, seed, max_train)
    )

    def _nearest_udf(n: int):
        return nearest_cells_udf(cent_mat, n)

    # the corpus side streams through the broadcast join and the per-pair
    # scoring at ITS OWN parallelism — spread a narrow scan first
    # (no-op at scale)
    c = spread_narrow(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
        ),
        "neighbor_id",
    ).withColumn("cell", _nearest_udf(1)(F.col("cv"))[0])

    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cell", F.explode(_nearest_udf(nprobe)(F.col("qv"))))
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            cosine(F.col("qv"), F.col("cv")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 65536,
    centroids: np.ndarray | None = None,
    quantize: bool = False,
) -> np.ndarray:
    """Materialize the IVF layout: ``<path>/centroids`` (cid, vector —
    one tiny file) and ``<path>/cells`` — the corpus vectors written
    ``partitionBy("cell")``, i.e. ONE PARQUET DIRECTORY PER INVERTED
    LIST. This turns the cell assignment from a runtime join key into a
    STORAGE property: a query touching ``nprobe`` cells prunes every
    other partition at the file listing, so serving cost scales with
    ``nprobe/n_centroids`` of the corpus, not the corpus — the property
    that makes IVF an index rather than a re-scan at 100 TB. Returns
    the centroid matrix for immediate probing.

    ``quantize=True`` stores the FAISS-IVF+SQ8 layout instead: int8
    components (``array<tinyint>``) plus the per-vector ``scale`` and
    exact float ``vnorm`` — :func:`scalar_quantize`'s exact recipe —
    so each probed cell reads ~4-8× fewer bytes than the float layout
    (the probe is bandwidth-bound); exactness comes back at query time
    by re-ranking a small candidate pool against the original vectors
    (``rerank_corpus`` in :func:`ivf_query_index`)."""
    spark = corpus.sparkSession
    cent_mat = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else coarse_centroids(corpus, vec_col, n_centroids, seed, max_train)
    )
    sel = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    # a narrow input (one local parquet split) would otherwise run the
    # assignment UDF AND the whole partitionBy write on one task; spread
    # the assignment, then re-key by cell so the layout keeps exactly
    # one writer (and so one file) per cell. Both exchanges vanish at
    # scale (spread_narrow no-ops past cluster parallelism, and the
    # cell re-key is gated on the same probe).
    narrow = sel.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    if narrow:
        sel = sel.repartition(spark.sparkContext.defaultParallelism, F.col("vec_id"))
    assigned = sel.withColumn("cell", nearest_cells_udf(cent_mat, 1)(F.col("v"))[0])
    if quantize:
        assigned = _sq8_cells(assigned)
    if narrow:
        assigned = assigned.repartition(
            spark.sparkContext.defaultParallelism, F.col("cell")
        )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cent_mat)],
        "cid int, vector array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return cent_mat


def _sq8_cells(assigned: DataFrame) -> DataFrame:
    """FAISS-IVF+SQ8 cell rows from ``(vec_id, v, cell)``:
    scalar_quantize's exact recipe, inlined so ``cell`` rides along
    (its select() drops extra columns; a join-back would be a corpus
    self-shuffle); byte cast is lossless for [-127, 127]."""
    vec = F.col("v")
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return assigned.select(
        "vec_id",
        F.transform(vec, lambda x: F.round(x / scale).cast("byte")).alias("qvec"),
        scale.alias("scale"),
        norm(vec).alias("vnorm"),
        "cell",
    )


def ivf_index_append(
    spark,
    path: str,
    new_rows: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance of a persisted :func:`build_ivf_index`
    layout: assign the new vectors with the STORED centroids (the
    coarse quantizer is FROZEN — the standard IVF maintenance recipe:
    appends ride the existing geometry, retraining happens only on
    measured drift, because moving a centroid invalidates every cell's
    membership) and APPEND to the cell partitions. Dynamic partition
    append touches only the cells that received vectors — an append of
    n rows costs O(n), never a corpus rewrite — and queries see the
    union on their next file listing, still partition-pruned. Detects
    the SQ8 layout from the stored schema and applies the identical
    transform. At 100 TB this is the difference between a nightly
    full-index rebuild and a per-batch O(batch) ingest."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    assigned = new_rows.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("cell", nearest_cells_udf(cent, 1)(F.col("v"))[0])
    if "qvec" in spark.read.parquet(f"{path}/cells").columns:
        assigned = _sq8_cells(assigned)
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_corpus: DataFrame | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """Probe a persisted :func:`build_ivf_index` layout: assign each
    query to its ``nprobe`` nearest centroids, then read ONLY those
    cell partitions (an explicit ``isin`` over the probed cell set —
    static partition pruning, visible as ``PartitionFilters`` in the
    scan; the probed set is bounded by ``n_queries × nprobe`` and by
    ``n_centroids``, so the collect is a bounded scalar fetch). On a
    float layout the result is identical to :func:`ivf_topk` run with
    the same centroids — pinned by
    ``tests/test_operators.py::test_ivf_index_roundtrip``.

    A ``quantize=True`` index is detected from its schema: the pruned
    scan scores the int8 rows (:func:`_dequantized_cos` — ~4-8× less
    read bandwidth). Pass ``rerank_corpus`` (the original float
    vectors) to recover exactness: the top ``rerank`` (default 10·k)
    approximate candidates per query are re-scored with exact float
    cosine — the candidate join touches O(queries × rerank) rows,
    never a cell. Without it, ranks and ``cos_sim`` are the
    de-quantized approximations.

    The query side is broadcast (probe-batch contract); for a
    DataFrame-sized query set use :func:`ivf_query_index_join`."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent_mat = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cell", F.explode(nearest_cells_udf(cent_mat, nprobe)(F.col("qv"))))
        .localCheckpoint(eager=False)
    )
    probe_cells = sorted(r["cell"] for r in q.select("cell").distinct().collect())
    cells = spark.read.parquet(f"{path}/cells").where(F.col("cell").isin(probe_cells))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))

    if "qvec" in cells.columns:  # SQ8 layout
        qq = scalar_quantize(
            queries.select(F.col(id_col).alias("q_id"), F.col(vec_col)), "q_id", vec_col
        ).select(
            F.col("q_id").alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("scale").alias("q_scale"),
            F.col("vnorm").alias("q_vnorm"),
        )
        approx = (
            cells.select(F.col("vec_id").alias("neighbor_id"), "qvec", "scale", "vnorm", "cell")
            .join(F.broadcast(q.select("query_id", "cell")), on="cell")
            .join(F.broadcast(qq), on="query_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn(
                "approx_cos", _dequantized_cos()
            )
        )
        if rerank_corpus is None:
            scored = approx.withColumn("cos_sim", F.col("approx_cos"))
        else:
            n_cand = rerank or 10 * k
            w_a = W.partitionBy("query_id").orderBy(
                F.col("approx_cos").desc(), F.col("neighbor_id")
            )
            cands = (
                approx.withColumn("arank", F.row_number().over(w_a))
                .where(F.col("arank") <= n_cand)
                .select("neighbor_id", "query_id")
            )
            exact_c = rerank_corpus.select(
                F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
            )
            scored = (
                cands.join(exact_c, "neighbor_id")
                .join(F.broadcast(q.select("query_id", "qv").distinct()), "query_id")
                .withColumn(
                    "cos_sim",
                    cosine(F.col("qv"), F.col("cv")),
                )
            )
    else:
        scored = (
            cells.select(
                F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
            )
            .join(F.broadcast(q), on="cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn(
                "cos_sim",
                cosine(F.col("qv"), F.col("cv")),
            )
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Pairs with cosine ≥ threshold, found via hyperplane buckets (plus
    1-bit-flip probes so near-identical vectors straddling one hyperplane
    still meet). Returns (id_a, id_b, cos_sim).

    Size ``nbits`` to the corpus (see :func:`hyperplane_lsh_topk`) and
    pass ``dim`` explicitly in production — the ``None`` fallback costs a
    one-row Spark job per call."""
    if dim is None:
        dim = len(df.select(vec_col).limit(1).collect()[0][0])
    planes = _hyperplanes(dim, nbits)
    # lazy checkpoint: materializes the aggregate-HOF signature ONCE for
    # both join legs (previously each leg re-evaluated it, and the probe
    # leg's explode re-evaluated it per flip via projection collapse)
    base = spread_narrow(
        df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")),
        "id",
    ).withColumns(
        # norm stored per ROW (rides the checkpoint) so the verify stage
        # pays one dot per candidate pair, not dot + two sqrt(Σx²);
        # dot/(na·nb) is bit-identical to cosine(a, b)
        {
            "sig": hyperplane_signature(F.col("v"), planes),
            "vn": norm(F.col("v")),
        }
    ).localCheckpoint(eager=False)
    probes = [F.col("sig")] + [F.col("sig").bitwiseXOR(F.lit(2**i)) for i in range(nbits)]
    a = base.withColumn("bucket", F.explode(F.array(*probes))).alias("a")
    b = base.withColumnRenamed("sig", "bucket").alias("b")
    return (
        a.join(b, on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.vn") * F.col("b.vn")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
        .where(F.col("cos_sim") >= threshold)
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | None = None,
    seed: int = 42,
    max_train: int = 65536,
    centroids: np.ndarray | None = None,
    max_iterations: int = 15,
    stats: dict | None = None,
    target_cluster_size: int = 2048,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with K-Means, find
    near-duplicate pairs ONLY within each cluster (cosine >=
    ``threshold``), group them into duplicate clusters via connected
    components, and keep exactly one member per group — the one with
    the LOWEST cosine similarity to its cluster centroid (the paper's
    keep-the-outlier rule: of five semantic copies, retain the least
    prototypical, preserving diversity). Singletons survive unchanged.
    Returns ``(id, cluster, centroid_sim, component)`` for survivors.

    Scale shape (100 TB lens): the candidate join is a self-join on the
    cluster id over DISTINCT vectors only — exact-duplicate vectors
    (bitwise-equal after the double cast) are collapsed to a min-id
    representative first, and rejoin the pair graph as (rep, member)
    edges. This is output-identical to the naive all-rows self-join
    (identical vectors share cluster, centroid_sim, and every pairwise
    cosine, so components and the survivor min_by are unchanged) but
    turns the adversarial boilerplate corpus — millions of copies of
    one embedding landing in one cluster — from |cluster|² candidates
    into |distinct vectors in cluster|² + a linear edge list
    (pinned by tests/test_skew.py::test_semdedup_degenerate_identical_cluster_is_linear).
    Candidate volume is thus Σ|distinct-in-cluster|² — ``n_clusters``
    is still THE knob and must grow with the corpus (the paper uses
    ~100k clusters at 1e8 docs; keep expected cluster size in the low
    thousands). Left ``None`` (r12 verdict #6: the manual knob could
    silently blow up the quadratic when a caller forgot it at 100×
    scale), it is DERIVED from one cheap ``count()``:
    ``max(16, ceil(n_rows / target_cluster_size))``, clamped so the
    bounded training sample keeps >= 64 points per centroid
    (``max_train // 64``) — raise ``max_train`` together with the
    corpus for paper-scale cluster counts. The chosen value is
    reported in ``stats["n_clusters"]``.
    Centroid training is bounded at ``max_train`` sampled
    rows regardless of corpus size, assignment is one Arrow-batched
    matmul pass (centroid matrix in the UDF closure, plan O(1) in
    ``n_clusters``), and survivor selection reuses
    :func:`thoth_spark.operators.dedup.quality_survivors` — a
    partial-aggregable max_by, safe under a degenerate giant duplicate
    group. Pass precomputed ``centroids`` to reuse a quantizer across
    snapshots (and for deterministic tests). Pass ``stats`` to receive
    ``{"n_rows", "n_distinct_vectors", "n_rep_pairs"}``."""
    from thoth_spark.operators.dedup import quality_survivors

    if n_clusters is None and centroids is None:
        n_rows = df.count()
        n_clusters = int(
            max(16, min(-(-n_rows // target_cluster_size), max_train // 64))
        )
    if stats is not None and centroids is None:
        stats["n_clusters"] = n_clusters
    cent_mat = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else coarse_centroids(df, vec_col, n_clusters, seed, max_train)
    )
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))
    cent_sq = (cent_mat * cent_mat).sum(axis=1)  # ||c||² per centroid

    # ONE fused Arrow pass for (cluster, centroid_sim): the split form —
    # nearest_cells_udf then a second scalar UDF for the cosine — crossed
    # the Python boundary twice per corpus row (two ArrowEvalPython
    # stages; the 4-task corpus pass was semdedup's single largest stage
    # in the r16 profile). Arithmetic is VERBATIM from the two UDFs it
    # replaces: the argmin uses nearest_cells_udf's ``||c||² − 2x·c``
    # stable argsort (ties to the lower cid), and the cosine re-derives
    # ``(x·c_sel)`` with the same elementwise-multiply-then-sum (NOT the
    # matmul column — summation order differs in the last ulp), so both
    # outputs are bit-identical to the split form.
    @pandas_udf("struct<cluster:int,centroid_sim:double>")
    def _assign_and_sim(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for vecs in it:
            x = np.stack(vecs.to_numpy())  # (batch, dim)
            d = cent_sq - 2.0 * (x @ cent_mat.T)  # (batch, n_centroids)
            c32 = np.argsort(d, axis=1, kind="stable")[:, 0].astype(np.int32)
            c = c32.astype(np.int64)
            num = (x * cent_mat[c]).sum(axis=1)
            den = np.sqrt((x * x).sum(axis=1)) * cent_norm[c]
            yield pd.DataFrame({"cluster": c32, "centroid_sim": num / den})

    base = (
        # the assignment pass + fingerprint are the corpus-wide per-row
        # cost; raise a narrow scan to cluster parallelism before them
        # (no-op at scale — see partitioning.spread_narrow)
        spread_narrow(
            df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")),
            "id",
        )
        .withColumn("__as", _assign_and_sim(F.col("v")))
        .withColumn("cluster", F.col("__as.cluster"))
        .withColumn("centroid_sim", F.col("__as.centroid_sim"))
        .drop("__as")
        .withColumn(
            # 128-bit exact-vector fingerprint (md5 over the canonical
            # double rendering; xxhash64's 64 bits would make a
            # corpus-scale collision — a silent wrong merge — plausible)
            "__vh",
            F.md5(F.concat_ws(",", F.transform(F.col("v"), lambda x: x.cast("string")))),
        )
        .localCheckpoint(eager=False)
    )
    rep = base.groupBy("__vh").agg(F.min("id").alias("__rep"))
    exact_pairs = (
        base.join(rep, "__vh")
        .where(F.col("id") != F.col("__rep"))
        # identical vectors share their (deterministic) cluster, so the
        # exact-dup edges are cluster-local like the verified ones —
        # carry the key for components_within
        .select(
            "cluster", F.col("__rep").alias("id_a"), F.col("id").alias("id_b")
        )
    )
    reps_only = base.join(
        rep.select(F.col("__rep").alias("id")), "id", "left_semi"
    )
    # The quadratic within-cluster verify, as a cogrouped vectorized
    # pass (bit-identical pair set — see _cogroup_threshold_pairs; the
    # per-pair form evaluated the dot fold interpreted per element).
    # The verify's reduce side is keyed by ``cluster`` alone, so its
    # parallelism is capped at n_clusters no matter how many shuffle
    # partitions exist — with fewer clusters than cores (the fixed-
    # quantizer twin, or any small corpus) it would run on a handful of
    # tasks. Salt one side k ways (k = ceil(parallelism / n_clusters)),
    # replicate the other, group on (cluster, salt): every (a, b) pair
    # still meets in EXACTLY one group (at a's salt), so the pair set —
    # and every downstream result — is unchanged, while the verify
    # spreads across the cluster. At scale n_clusters >> cores ->
    # k == 1 -> plain per-cluster groups with zero replication (guide
    # §2.5 hot-key salting).
    _par = reps_only.sparkSession.sparkContext.defaultParallelism
    k_salt = max(1, -(-_par // max(1, int(cent_mat.shape[0]))))
    rp_in = reps_only.select("id", "v", "cluster")
    if k_salt > 1:
        a = rp_in.withColumn(
            "__ps", F.pmod(F.xxhash64(F.col("id")), F.lit(k_salt)).cast("int")
        )
        b = rp_in.withColumn(
            "__ps",
            F.explode(F.array(*[F.lit(i).cast("int") for i in range(k_salt)])),
        )
        rp_keys = ["cluster", "__ps"]
    else:
        a = b = rp_in
        rp_keys = ["cluster"]
    rep_pairs = _cogroup_threshold_pairs(
        a, b, rp_keys, threshold, _col_type(df, id_col)
    )
    if stats is not None:
        stats["n_rows"] = base.count()
        stats["n_distinct_vectors"] = rep.count()
        stats["n_rep_pairs"] = rep_pairs.count()
    pairs = exact_pairs.union(rep_pairs)
    scored = base.withColumn("__q", -F.col("centroid_sim"))
    return quality_survivors(
        scored, pairs, "id", "__q", max_iterations=max_iterations
    ).select("id", "cluster", F.round("centroid_sim", 6).alias("centroid_sim"), "component")


#: the collect-based serves ship the query batch to every task in a UDF
#: closure — the probe-batch contract. Past this many queries the
#: closure/driver cost dominates and the join serves are the right tool
#: (r12 verdict watch item #2: a query TABLE pointed at a collect serve
#: became a silent driver bottleneck; now it fails loudly with the
#: distributed alternative named). The collects below are limit-capped,
#: so the driver never materializes more than the cap + 1 rows.
MAX_QUERY_BATCH = 100_000


def _collect_query_batch(
    queries: DataFrame, id_col: str, vec_col: str, caller: str, alternative: str
) -> list:
    q_rows = (
        queries.select(id_col, vec_col).limit(MAX_QUERY_BATCH + 1).collect()
    )
    if len(q_rows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"{caller} collects the query set to the driver (bounded "
            f"probe-batch contract, <= {MAX_QUERY_BATCH} queries); for "
            f"DataFrame-sized query sets use {alternative}, which keeps "
            "queries distributed end-to-end."
        )
    return q_rows


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with the scoring inner loop in numpy (BLAS).

    Same result as :func:`brute_force_topk`; different physical strategy:
    the (small) query matrix is closed over and shipped to every task,
    each Arrow batch of corpus vectors scores against ALL queries in one
    ``batch @ Q.T`` matmul, and only each batch's per-query top-k rows
    are emitted — so the shuffle carries O(k × queries × batches) rows.
    At 100 TB this beats per-element JVM expression evaluation by the
    BLAS factor; prefer it once the corpus is large and queries are
    batched.
    """
    import pandas as pd

    q_rows = _collect_query_batch(
        queries, id_col, vec_col, "brute_force_topk_pandas",
        "brute_force_topk (broadcast join) or ivf_query_index_join",
    )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype="float64")
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            c = np.array(list(pdf[vec_col]), dtype="float64")
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ q_mat.T  # (batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand = np.where(mask)[0]
                top = cand[np.argsort(-col[cand], kind="stable")[: k]]
                out_q += [qid] * len(top)
                out_n += list(ids[top])
                out_s += list(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    id_type = _col_type(corpus, id_col)
    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def knn_classify(
    labeled: DataFrame,
    unlabeled: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label propagation: each unlabeled vector takes the majority
    label among its ``k`` nearest labeled seeds by cosine. The standard
    scale-out for "we hand-labeled a small seed set, label the corpus":
    the seed matrix is bounded (collected once, closed over), and the
    corpus side is ONE narrow Arrow-batched ``mapInPandas`` pass — each
    batch scores against all seeds in a single BLAS matmul and emits its
    own verdicts, so the plan has ZERO shuffles (plan-locked) and cost
    is one corpus scan regardless of corpus size.

    Deterministic and SQL-replayable by construction: neighbor order is
    (cos DESC, seed id ASC), vote tie-break is (votes DESC, label ASC).
    Self-matches on id are excluded (a seed that also appears unlabeled
    never votes for itself). Returns ``(id, pred_label, votes)``; the
    id and label columns keep their input types (string labels vote
    and tie-break lexicographically — r10 advice: the old int64
    coercion crashed on non-integer labels).

    The seed collect is bounded by :data:`MAX_QUERY_BATCH` (the same
    contract as the probe-batch ANN serves): a corpus-sized "labeled"
    side fails loudly with the distributed alternative named instead of
    OOMing the driver — past that size, label propagation should run
    through the join serves (:func:`ivf_query_index_join` for top-k
    neighbors as an equi-join, then a per-id majority vote), which keep
    both sides distributed.
    """
    seeds = (
        labeled.select(id_col, vec_col, label_col)
        .limit(MAX_QUERY_BATCH + 1)
        .collect()
    )
    if len(seeds) > MAX_QUERY_BATCH:
        raise ValueError(
            "knn_classify collects the labeled seed set to the driver "
            f"(bounded seed contract, <= {MAX_QUERY_BATCH} rows); for "
            "corpus-sized labeled sets compute neighbors with a join "
            "serve (ivf_query_index_join / knn_graph) and majority-vote "
            "per id, which keeps the labeled side distributed."
        )
    if not seeds:
        raise ValueError("labeled seed set is empty")
    s_ids = np.array([r[0] for r in seeds])
    s_lab = np.array([r[2] for r in seeds])
    s_mat = np.array([r[1] for r in seeds], dtype="float64")
    s_mat /= np.linalg.norm(s_mat, axis=1, keepdims=True)
    kk = min(k, len(seeds))
    types = {f.name: f.dataType.simpleString() for f in unlabeled.schema.fields}
    id_type = types[id_col]
    label_type = {
        f.name: f.dataType.simpleString() for f in labeled.schema.fields
    }[label_col]

    def score(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            c = np.array(list(pdf[vec_col]), dtype="float64")
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ s_mat.T  # (batch, n_seeds)
            preds, votes = [], []
            for i in range(len(ids)):
                row = sims[i]
                mask = s_ids != ids[i]
                # neighbor order (cos DESC, seed id ASC) — lexsort keys
                # are applied last-key-primary
                order = np.lexsort((s_ids[mask], -row[mask]))[:kk]
                labs, counts = np.unique(s_lab[mask][order], return_counts=True)
                # vote tie-break (votes DESC, label ASC): np.unique
                # returns labs ASC, so a stable sort on -counts keeps
                # the smallest label first among ties
                best = labs[np.argsort(-counts, kind="stable")[0]]
                preds.append(best)
                votes.append(int(counts[labs == best][0]))
            yield pd.DataFrame(
                {"id": ids, "pred_label": preds, "votes": votes}
            )

    return unlabeled.select(id_col, vec_col).mapInPandas(
        score, schema=f"id {id_type}, pred_label {label_type}, votes int"
    )


def embedding_cross_neardup(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.95,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cross-corpus cosine near-dup pairs (left × right, never left ×
    left): hyperplane buckets with 1-bit-flip probes on the LEFT side
    only — the same recall guarantee as :func:`embedding_near_dup_pairs`
    for pairs straddling one hyperplane, at half the probe fan-out of
    running it on both sides. Returns ``(left_id, right_id, cos_sim)``.

    This is the semantic-decontamination primitive: left = training
    corpus, right = benchmark/eval set; candidate volume is bucketed
    (O(|L|·|R| / 2^nbits) expected), so the eval set never cross-joins
    the corpus."""
    if dim is None:
        dim = len(left.select(vec_col).limit(1).collect()[0][0])
    planes = _hyperplanes(dim, nbits)
    l = spread_narrow(
        left.select(
            F.col(id_col).alias("left_id"), _as_double(F.col(vec_col)).alias("lv")
        ),
        "left_id",
    ).withColumns(
        {
            "sig": hyperplane_signature(F.col("lv"), planes),
            "ln": norm(F.col("lv")),
        }
    ).localCheckpoint(eager=False)
    r = spread_narrow(
        right.select(
            F.col(id_col).alias("right_id"), _as_double(F.col(vec_col)).alias("rv")
        ),
        "right_id",
    ).withColumns(
        {
            "bucket": hyperplane_signature(F.col("rv"), planes),
            "rn": norm(F.col("rv")),
        }
    )
    probes = [F.col("sig")] + [
        F.col("sig").bitwiseXOR(F.lit(2**i)) for i in range(nbits)
    ]
    a = l.withColumn("bucket", F.explode(F.array(*probes)))
    return (
        a.join(r, on="bucket")
        .select(
            "left_id",
            "right_id",
            F.round(
                dot(F.col("lv"), F.col("rv"))
                / (F.col("ln") * F.col("rn")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Drop training vectors semantically too close to ANY eval vector
    (cosine ≥ threshold) — embedding-level benchmark decontamination,
    the semantic sibling of the n-gram `contamination` check in
    ``text.py``. The flagged-id frame is tiny (≤ |train| ids, usually
    ≪) and anti-joined back; candidates come from the bucketed
    :func:`embedding_cross_neardup`, so the plan never cross-joins the
    corpus against the eval set."""
    flagged = (
        embedding_cross_neardup(
            train, eval_df, threshold, nbits, id_col, vec_col, dim
        )
        .select(F.col("left_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC) — Jégou et al. 2011, the FAISS IndexPQ
# recipe: split the (L2-normalized) vector into m subspaces, quantize each
# subvector against a per-subspace codebook, score queries against the
# CODES via per-query lookup tables (asymmetric distance computation).
# ---------------------------------------------------------------------------


def _normalized_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def pq_codebooks_seeded(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
) -> np.ndarray:
    """Deterministic PQ codebooks: the normalized subvectors of the
    ``n_codes`` smallest-id vectors (a bounded collect — the
    replayable-init trick of clustering.seed_centroids). Returns
    ``(m_subspaces, n_codes, dim/m_subspaces)`` float64. Not a quality
    codebook — the ACCOUNTABLE one; see :func:`train_pq_codebooks` for
    the production path."""
    rows = (
        corpus.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .limit(n_codes)
        .collect()
    )
    mat = _normalized_rows(np.asarray([r.v for r in rows], dtype=np.float64))
    dim = mat.shape[1]
    assert dim % m_subspaces == 0, (dim, m_subspaces)
    return mat.reshape(n_codes, m_subspaces, dim // m_subspaces).transpose(1, 0, 2)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_train: int = 65536,
    iterations: int = 10,
) -> np.ndarray:
    """Production PQ codebooks: per-subspace Lloyd k-means on a bounded
    normalized sample, run driver-side in numpy (the sample is
    ``max_train × dim`` floats — tens of MB; codebook quality needs a
    sample, never the corpus, exactly like
    :func:`coarse_centroids`)."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(
        [
            r.v
            for r in corpus.select(_as_double(F.col(vec_col)).alias("v"))
            .limit(max_train)
            .collect()
        ],
        dtype=np.float64,
    )
    sample = _normalized_rows(sample)
    return _codebooks_from_matrix(sample, m_subspaces, n_codes, rng, iterations)


def _codebooks_from_matrix(
    sample: np.ndarray,
    m_subspaces: int,
    n_codes: int,
    rng: np.random.Generator,
    iterations: int,
) -> np.ndarray:
    """Per-subspace Lloyd on an already-prepared (n, dim) matrix —
    shared by the plain (normalized-vector) and residual trainers."""
    n, dim = sample.shape
    d_sub = dim // m_subspaces
    assert dim % m_subspaces == 0, (dim, m_subspaces)
    books = np.empty((m_subspaces, n_codes, d_sub))
    for s in range(m_subspaces):
        x = sample[:, s * d_sub : (s + 1) * d_sub]
        cent = x[rng.choice(n, size=min(n_codes, n), replace=False)]
        if len(cent) < n_codes:  # degenerate tiny sample: pad by repeat
            cent = np.resize(cent, (n_codes, d_sub))
        for _ in range(iterations):
            d = (cent * cent).sum(axis=1) - 2.0 * (x @ cent.T)
            asg = np.argmin(d, axis=1)
            for c in range(n_codes):
                member = x[asg == c]
                if len(member):
                    cent[c] = member.mean(axis=0)
        books[s] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus against PQ ``codebooks``: L2-normalize, per
    subspace take the L2-nearest codeword (ties → lower code, the
    stable-argsort rule every quantizer in this repo shares). Returns
    ``(id, codes array<int>)`` — the 4-byte-per-subspace compressed
    corpus you PERSIST; at 100 TB this table is ~dim·4/m of the float32
    original (64-dim → 8 codes = 32 bytes vs 256: 8×), and ANN scans
    read it instead of the floats. One Arrow-batched pass, codebook
    tensor in the closure, plan O(1) in n_codes."""
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, n_codes, d_sub = cb.shape
    cb_sq = (cb * cb).sum(axis=2)  # (m, n_codes)

    @pandas_udf(ArrayType(IntegerType()))
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            x = _normalized_rows(np.stack(vecs.to_numpy()).astype(np.float64))
            b = x.shape[0]
            codes = np.empty((b, m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * d_sub : (s + 1) * d_sub]
                d = cb_sq[s] - 2.0 * (xs @ cb[s].T)
                codes[:, s] = np.argsort(d, axis=1, kind="stable")[:, 0]
            yield pd.Series(list(codes))

    return corpus.select(
        F.col(id_col).alias("id"), encode(_as_double(F.col(vec_col))).alias("codes")
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank_with: DataFrame | None = None,
    rerank_pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a :func:`pq_encode`d corpus: per query build the
    m×n_codes lookup table ``LUT[s][c] = q̂_s · codebook_s[c]`` once,
    then every corpus CODE row scores as ``Σ_s LUT[s][codes[s]]`` — a
    numpy gather, no float vectors touched. One Arrow-batched
    ``mapInPandas`` pass emits only each batch's per-query top
    candidates, so the shuffle carries O(pool × queries × batches) rows
    (the brute_force_topk_pandas shape, on 8-byte codes instead of
    256-byte floats).

    Without ``rerank_with``: returns ``(query_id, neighbor_id,
    adc_score, rank)`` — the pure compressed-domain ranking. With
    ``rerank_with`` (the original float corpus): the global ADC top
    ``rerank_pool`` per query is re-scored EXACTLY (semi-join pulls
    just pool×queries float vectors) and the output matches
    :func:`brute_force_topk`'s ``(query_id, neighbor_id, cos_sim,
    rank)`` contract — at ``rerank_pool ≥ |corpus|`` it is bit-equal
    to brute force, the calibration point the hash gate pins."""
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, n_codes, d_sub = cb.shape
    q_rows = _collect_query_batch(
        queries, id_col, vec_col, "pq_topk", "ivfpq_query_index_join"
    )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = _normalized_rows(np.array([r[1] for r in q_rows], dtype=np.float64))
    # (n_queries, m, n_codes): LUT[j, s, c] = q̂_j[s] · cb[s][c]
    lut = np.einsum(
        "jsd,scd->jsc", q_mat.reshape(len(q_ids), m, d_sub), cb
    )
    pool = max(k, rerank_pool if rerank_with is not None else k)

    def score(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (b, m)
            b = codes.shape[0]
            # gather: scores[i, j] = Σ_s lut[j, s, codes[i, s]]
            sims = lut[:, np.arange(m)[None, :], codes].sum(axis=2).T  # (b, nq)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                cand = np.where(ids != qid)[0]
                top = cand[np.argsort(-col[cand], kind="stable")[:pool]]
                out_q += [qid] * len(top)
                out_n += list(ids[top])
                out_s += list(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    id_type = _col_type(codes_df, "id")
    scored = codes_df.mapInPandas(
        score, schema=f"query_id {id_type}, neighbor_id {id_type}, adc_score double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= pool
    )
    if rerank_with is None:
        return ranked.select(
            "query_id",
            "neighbor_id",
            F.round("adc_score", 6).alias("adc_score"),
            "rank",
        )
    c = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    exact = (
        ranked.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos_sim", cosine(F.col("qv"), F.col("cv"))
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 16,
    rerank_pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    residual: bool = False,
    max_train: int = 65536,
) -> DataFrame:
    """IVF-PQ — the production ANN shape at 10⁹+ vectors (FAISS
    IndexIVFPQ): a coarse quantizer routes every vector
    to a cell, vectors are PQ-encoded (m bytes each), a query ADC-scans
    ONLY its ``nprobe`` nearest cells' codes, and the top
    ``rerank_pool`` candidates are re-scored exactly.

    Scale shape: the scan is one Arrow-batched ``mapInPandas`` pass
    over ``(cell, id, codes)`` that masks each batch to the rows whose
    cell is probed by each query — on a cell-partitioned persisted
    layout (``build_ivf_index``'s parquet recipe) the mask becomes
    partition PRUNING and the un-probed (1 − nprobe/n_centroids)
    fraction of the corpus is never read; the emitted shuffle carries
    O(pool × queries × batches) rows and the rerank semi-join touches
    pool×queries float vectors. At ``nprobe = n_centroids`` and
    ``rerank_pool ≥ |corpus|`` the output is bit-equal to
    :func:`brute_force_topk` — the calibration twin the hash gate pins
    (`similarity_topk_ivfpq_fullprobe`), exactly like the IVF and PQ
    components' own twins.

    ``residual=True`` is the full FAISS recipe: codes quantize
    ``x̂ − c_cell`` (trained on a bounded residual sample), and the ADC
    score decomposes as ``q̂·c_cell + Σ_s q̂_s·cb_s[code_s]`` — the
    cell bias is a (queries × cells) lookup added per batch. Residuals
    are much smaller than the vectors, so the same byte budget spends
    its precision on within-cell structure; the compressed-domain
    ranking inside a cell becomes informative where global codes
    collapse cell members onto one codeword
    (tests/test_operators.py::test_ivfpq_residual_beats_global_adc)."""
    cent = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else coarse_centroids(corpus, vec_col, n_centroids, seed)
    )
    cb = _ivfpq_codebooks(
        corpus, cent, m_subspaces, n_codes, seed, max_train, vec_col,
        residual, codebooks,
    )
    encoded = _ivfpq_encode(corpus, cent, cb, residual, id_col, vec_col)
    return _ivfpq_rank(
        encoded,
        corpus,
        queries,
        cent,
        cb,
        residual,
        k=k,
        nprobe=nprobe,
        rerank_pool=rerank_pool,
        id_col=id_col,
        vec_col=vec_col,
        id_type=_col_type(corpus, id_col),
    )


def _ivfpq_codebooks(
    corpus: DataFrame,
    cent: np.ndarray,
    m_subspaces: int,
    n_codes: int,
    seed: int,
    max_train: int,
    vec_col: str,
    residual: bool,
    codebooks: np.ndarray | None,
) -> np.ndarray:
    """Resolve the PQ codebooks for an IVF-PQ build: caller-supplied, or
    trained on a bounded sample — of RESIDUALS (x̂ − ĉ_cell, the FAISS
    recipe) when ``residual``, of normalized vectors otherwise."""
    if codebooks is not None:
        return np.ascontiguousarray(codebooks, dtype=np.float64)
    if not residual:
        return train_pq_codebooks(
            corpus,
            vec_col,
            m_subspaces=m_subspaces,
            n_codes=n_codes,
            seed=seed,
            max_train=max_train,
        )
    raw = np.asarray(
        [
            r.v
            for r in corpus.select(_as_double(F.col(vec_col)).alias("v"))
            .limit(max_train)
            .collect()
        ],
        dtype=np.float64,
    )
    d_s = (cent * cent).sum(axis=1) - 2.0 * (raw @ cent.T)
    resid = _normalized_rows(raw) - _normalized_rows(cent)[np.argmin(d_s, axis=1)]
    return _codebooks_from_matrix(
        resid, m_subspaces, n_codes, np.random.default_rng(seed), 10
    )


def _ivfpq_encode(
    corpus: DataFrame,
    cent: np.ndarray,
    cb: np.ndarray,
    residual: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``(id, cell, codes)`` for an IVF-PQ corpus: cell ASSIGNMENT on the
    raw centroids (the rule the corpus path and ivf_topk share), codes
    from :func:`pq_encode` (global) or the residual encoder — residual
    math lives on the unit sphere: the ranking target is cosine, so
    vectors are normalized and the subtracted cell center must be
    too."""
    base = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("cell", nearest_cells_udf(cent, 1)(F.col("v"))[0])
    if not residual:
        return base.drop("v").join(
            pq_encode(corpus, cb, id_col=id_col, vec_col=vec_col), "id"
        )
    cent_hat = _normalized_rows(cent)
    m, _, d_sub = cb.shape
    cb_sq = (cb * cb).sum(axis=2)

    @pandas_udf(ArrayType(IntegerType()))
    def encode_res(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        x = _normalized_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        r = x - cent_hat[cells.to_numpy().astype(np.int64)]
        b = r.shape[0]
        codes = np.empty((b, m), dtype=np.int32)
        for s in range(m):
            rs = r[:, s * d_sub : (s + 1) * d_sub]
            dd = cb_sq[s] - 2.0 * (rs @ cb[s].T)
            codes[:, s] = np.argsort(dd, axis=1, kind="stable")[:, 0]
        return pd.Series(list(codes))

    return base.select(
        "id", "cell", encode_res(F.col("v"), F.col("cell")).alias("codes")
    )


def _ivfpq_probe(q_mat: np.ndarray, cent: np.ndarray, nprobe: int) -> np.ndarray:
    """Per-query probe sets under the ONE ranking rule ``_ivfpq_rank``
    scores with: ``||c||² − 2·q̂·c`` over NORMALIZED queries. Every
    IVF-PQ consumer — the in-UDF candidate masks AND the persisted
    index's partition prefilter — must derive its probe set from this
    helper: the rule is not scale-invariant in q, so an earlier
    version that assigned prefilter cells from RAW query vectors could
    prune cells (out of the parquet scan) that the rank stage still
    masked to, silently dropping candidates for non-unit-norm
    queries."""
    d = (cent * cent).sum(axis=1) - 2.0 * (q_mat @ cent.T)
    return np.argsort(d, axis=1, kind="stable")[:, :nprobe]


def _ivfpq_rank(
    encoded: DataFrame,
    rerank_corpus: DataFrame,
    queries: DataFrame,
    cent: np.ndarray,
    cb: np.ndarray,
    residual: bool,
    k: int,
    nprobe: int,
    rerank_pool: int,
    id_col: str,
    vec_col: str,
    id_type: str,
    q_rows: list | None = None,
) -> DataFrame:
    """The IVF-PQ serving stage shared by the in-memory path
    (:func:`ivfpq_topk`) and the persisted index
    (:func:`ivfpq_query_index`): per-query ADC LUT + probe set, one
    Arrow-batched scan over ``(id, cell, codes)`` masking each batch to
    the rows whose cell is probed (partition PRUNING on a
    cell-partitioned layout), global ADC top-``pool``, exact rerank
    against ``rerank_corpus``. ``q_rows`` (collected ``(id, vector)``
    rows) lets the persisted-index caller reuse its prefilter collect —
    one driver job per serve instead of two."""
    m, _, d_sub = cb.shape
    cent_hat = _normalized_rows(cent)
    if q_rows is None:
        q_rows = _collect_query_batch(
            queries, id_col, vec_col, "ivfpq_topk", "ivfpq_query_index_join"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = _normalized_rows(np.array([r[1] for r in q_rows], dtype=np.float64))
    lut = np.einsum("jsd,scd->jsc", q_mat.reshape(len(q_ids), m, d_sub), cb)
    bias = (q_mat @ cent_hat.T) if residual else None  # (nq, n_centroids)
    probe = _ivfpq_probe(q_mat, cent, nprobe)  # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    pool = max(k, rerank_pool)

    def score(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            sims = lut[:, np.arange(m)[None, :], codes].sum(axis=2).T
            if bias is not None:
                sims = sims + bias[:, cells.astype(np.int64)].T
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                mask = (ids != qid) & np.isin(
                    cells, np.fromiter(probe_sets[j], dtype=np.int64)
                )
                cand = np.where(mask)[0]
                top = cand[np.argsort(-sims[cand, j], kind="stable")[:pool]]
                out_q += [qid] * len(top)
                out_n += list(ids[top])
                out_s += list(sims[top, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    scored = encoded.select("id", "cell", "codes").mapInPandas(
        score, schema=f"query_id {id_type}, neighbor_id {id_type}, adc_score double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= pool
    )
    c = rerank_corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    exact = (
        ranked.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos_sim", cosine(F.col("qv"), F.col("cv"))
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    m_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 65536,
    residual: bool = False,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the IVF-PQ layout — the table an ANN deployment at
    10⁹+ vectors actually persists (FAISS IndexIVFPQ on disk):

    - ``<path>/cells`` — ``(id, codes array<int>)`` written
      ``partitionBy("cell")``: ONE PARQUET DIRECTORY PER INVERTED LIST,
      m 4-byte codes per vector instead of dim floats, so a probed
      query reads ``nprobe/n_centroids`` of the corpus AND only m ints
      per row of what it reads — the two compressions multiply;
    - ``<path>/centroids`` — the coarse quantizer (cid, vector);
    - ``<path>/codebooks`` — the PQ codebooks flattened to
      (s, c, vector) rows;
    - ``<path>/meta`` — (residual, m_subspaces, n_codes): the query
      side must score residual codes with the q̂·ĉ_cell bias, and a
      layout flag beats guessing from schema.

    Returns ``(centroid_matrix, codebooks)`` for immediate probing.
    Query with :func:`ivfpq_query_index`; at ``nprobe = n_centroids``
    and an unbounded rerank pool the roundtrip is bit-equal to
    :func:`brute_force_topk` (the hash-gated calibration twin
    ``similarity_topk_ivfpq_index_fullprobe``)."""
    spark = corpus.sparkSession
    cent = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else coarse_centroids(corpus, vec_col, n_centroids, seed)
    )
    cb = _ivfpq_codebooks(
        corpus, cent, m_subspaces, n_codes, seed, max_train, vec_col,
        residual, codebooks,
    )
    # spread a narrow input before the encode UDF, then re-key by cell
    # so the layout keeps one writer/file per cell — same local-only
    # treatment as build_ivf_index (both exchanges vanish at scale)
    enc_in = spread_narrow(corpus, id_col)
    encoded = _ivfpq_encode(enc_in, cent, cb, residual, id_col, vec_col)
    if enc_in is not corpus:
        encoded = encoded.repartition(
            spark.sparkContext.defaultParallelism, F.col("cell")
        )
    encoded.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cent)],
        "cid int, vector array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    m, n_c, _ = cb.shape
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in cb[s, c]])
            for s in range(m)
            for c in range(n_c)
        ],
        "s int, c int, vector array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame(
        [(bool(residual), m, n_c)],
        "residual boolean, m_subspaces int, n_codes int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return cent, cb


def ivfpq_index_append(
    spark,
    path: str,
    new_rows: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance of a persisted :func:`build_ivfpq_index`
    layout — the PQ twin of :func:`ivf_index_append` (r13: the IVF
    float/SQ8 index had O(batch) nightly ingest, the PQ index did not):
    encode the new vectors with the STORED quantizers (coarse centroids
    AND codebooks are frozen — retraining either invalidates every
    stored code; rebuild on measured drift instead, see
    examples/ann_serving.py stage 5) via the same :func:`_ivfpq_encode`
    rule the builder used — including the residual flag from the meta
    table — and dynamic-partition-append only the touched cells. An
    append of n rows costs O(n) regardless of index size; both the
    collect and join serves see the union at their next file listing,
    still partition-pruned."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    cb_rows = spark.read.parquet(f"{path}/codebooks").orderBy("s", "c").collect()
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    cb = np.asarray(
        [r["vector"] for r in cb_rows], dtype=np.float64
    ).reshape(meta["m_subspaces"], meta["n_codes"], -1)
    _ivfpq_encode(
        new_rows, cent, cb, bool(meta["residual"]), id_col, vec_col
    ).write.mode("append").partitionBy("cell").parquet(f"{path}/cells")


def ivf_index_compact(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    table: str = "cells",
    part_col: str | list[str] = "cell",
    schema: str | None = None,
    transform=None,
) -> dict:
    """Compact the ``cells`` table of a persisted IVF / IVF-PQ index
    (r13): continuous ingest (:func:`ivf_index_append` /
    :func:`ivfpq_index_append`, or the streaming
    ``index_ingest_foreach_batch`` sink) appends one parquet file per
    touched cell per batch — after thousands of micro-batches the file
    count, not the data, dominates listing and open/seek cost. This
    rewrites the cell table to ~``target_file_bytes`` files (one file
    per cell minimum — the cell directory is the pruning unit) and
    swaps it in with filesystem renames (atomic per rename on HDFS and
    local FS; a reader between the two renames must retry, the standard
    OPTIMIZE caveat outside a table format). Quantizers, layout, and
    serve results are untouched — pinned by
    ``test_ivf_index_compact_preserves_serves``. Returns
    ``{files_before, files_after, bytes}``.

    ``table``/``part_col``/``schema``/``transform`` generalize the
    rewrite to any partitioned-append layout of the same shape (r16:
    the span-hash index's ``spans`` table — ``(bid, bucket)``-
    partitioned — compacts through ``dedup.span_index_compact``, which
    passes the stored DDL so even a file-less fresh index compacts as
    a no-op instead of failing schema inference, plus a transform that
    collapses retry-isolation partitions the rewrite may fold)."""
    import math

    part_cols = [part_col] if isinstance(part_col, str) else list(part_col)
    cells_src = f"{path}/{table}"
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(cells_src)
    files_before = len(df.inputFiles())
    if files_before == 0:
        # nothing to rewrite — and the rename dance below would fail on
        # a tmp dir a zero-row partitioned write never creates
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    if transform is not None:
        df = transform(df)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(cells_src).getFileSystem(conf)
    total = fs.getContentSummary(hpath(cells_src)).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    tmp, old = f"{path}/{table}_compacting", f"{path}/{table}_old"
    for stale in (tmp, old):  # leftovers from a crashed prior compact
        fs.delete(hpath(stale), True)
    df.repartition(n, *[F.col(c) for c in part_cols]).write.mode(
        "overwrite"
    ).partitionBy(*part_cols).parquet(tmp)
    if not fs.rename(hpath(cells_src), hpath(old)):
        raise IOError(f"compact: could not move {cells_src} aside")
    if not fs.rename(hpath(tmp), hpath(cells_src)):
        fs.rename(hpath(old), hpath(cells_src))  # roll back
        raise IOError(f"compact: could not install {tmp}")
    fs.delete(hpath(old), True)
    files_after = len(spark.read.parquet(cells_src).inputFiles())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": int(total),
    }


def ivfpq_query_index(
    spark,
    path: str,
    queries: DataFrame,
    rerank_corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank_pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted :func:`build_ivfpq_index` layout: load the
    (tiny) quantizers, assign each query its ``nprobe`` nearest cells,
    read ONLY those cell partitions of the code table (static partition
    pruning — ``PartitionFilters`` in the scan, the bounded ``isin``
    collect is n_queries × nprobe ≤ n_centroids values), ADC-rank the
    codes, and exact-rerank the global top ``rerank_pool`` against
    ``rerank_corpus`` (the original float vectors — the candidate join
    touches O(queries × pool) rows, never a cell). Identical to
    :func:`ivfpq_topk` run with the same quantizers — pinned by
    ``tests/test_operators.py::test_ivfpq_index_roundtrip``."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    cb_rows = spark.read.parquet(f"{path}/codebooks").orderBy("s", "c").collect()
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    m, n_c = meta["m_subspaces"], meta["n_codes"]
    cb = np.asarray([r["vector"] for r in cb_rows], dtype=np.float64).reshape(
        m, n_c, -1
    )
    # ONE bounded collect (n_queries × dim — the query set is small by
    # design), reused by the rank stage; probe cells come from
    # _ivfpq_probe, the SAME normalized rule the rank stage masks with,
    # so the partition prefilter can never prune a cell the scorer
    # still expects (non-unit-norm queries diverge under the raw-vector
    # rule this replaced)
    q_rows = _collect_query_batch(
        queries, id_col, vec_col, "ivfpq_query_index", "ivfpq_query_index_join"
    )
    q_mat = _normalized_rows(np.asarray([r[1] for r in q_rows], dtype=np.float64))
    probe_cells = sorted({int(c) for c in _ivfpq_probe(q_mat, cent, nprobe).ravel()})
    encoded = spark.read.parquet(f"{path}/cells").where(
        F.col("cell").isin(probe_cells)
    )
    return _ivfpq_rank(
        encoded,
        rerank_corpus,
        queries,
        cent,
        cb,
        bool(meta["residual"]),
        k=k,
        nprobe=nprobe,
        rerank_pool=rerank_pool,
        id_col=id_col,
        vec_col=vec_col,
        id_type=_col_type(rerank_corpus, id_col),
        q_rows=q_rows,
    )


# ---------------------------------------------------------------------------
# Join-based index serving: the query set stays a DataFrame end-to-end.
#
# The collect-based serves above (`ivf_query_index`, `ivfpq_query_index`,
# `brute_force_topk_pandas`, `pq_topk`) ship the query batch to every task
# in a UDF closure — the right physical strategy for the serve-a-probe-
# batch contract (queries are a bounded batch by design), but a driver
# bottleneck the moment a user points them at a query TABLE: dedup-by-ANN,
# corpus-vs-corpus retrieval, bulk re-embedding joins. These variants keep
# queries distributed: only the model-sized artifacts (centroid matrix,
# PQ codebooks — KBs to a few MB) ride in closures/broadcasts, the
# query×cell match is an equi-join, and scoring runs over the joined
# frame. Crossover note (SCALE.md): below ~10⁴ queries the closure path
# wins (no query-side shuffle); above it — and always when the query set
# is itself a table — use these.
# ---------------------------------------------------------------------------


#: rows of the query matrix scored per accumulator block inside the
#: cogrouped scorer — bounds the (rows × |cell slice|) float64 scratch
#: at ~4096 × cell-slice doubles regardless of how many queries probe a
#: cell.
_COGROUP_Q_BLOCK = 4096
#: candidate-axis block of the cogrouped scorers (r16 advice: an
#: unbounded candidate dimension made the scratch matrix group-sized —
#: ~3 GB for a 100k-row cell slice — where the pair join it replaced
#: streamed; 4096×16384 float64 is a flat 512 MB ceiling per task).
_COGROUP_C_BLOCK = 16384


def _cogroup_topk_scores(
    cells_s: DataFrame, qq: DataFrame, k: int, id_type: str
) -> DataFrame:
    """Per-(cell, salt) vectorized cosine scoring with an exact
    per-group top-``k`` cut — the corpus-vs-corpus fast path of
    :func:`ivf_query_index_join`.

    The pair-join form evaluates the aggregate-HOF ``dot`` fold
    INTERPRETED per element per candidate pair (guide §4.1); for a
    corpus-as-queries fullprobe serve that is |corpus|²-ish folds and
    was the single largest stage of the r16 profile (56 s of task time
    at sf0.1). Here both sides shuffle ONCE by (cell, __salt) — the
    same keys, and the same bytes, the salted equi-join already moved —
    and each group is scored as 64 vectorized numpy passes.

    Exactness (the driver hash-gates these queries):

    - dots and norms accumulate SEQUENTIALLY ACROSS DIMENSIONS
      (``acc += Q[:,i] * C[:,i]``-style outer products from a zero
      accumulator), which reproduces the JVM fold's left-associated
      IEEE addition order bit-for-bit — NOT a BLAS matmul, whose
      blocked summation differs in the last ulp;
    - the per-group cut keeps the top ``k`` by the SAME total order the
      downstream window uses (cos_sim desc, neighbor_id asc — total
      because ids are unique), so the global window over the union of
      group winners returns exactly the join path's rows (two-level
      top-k), pinned by ``test_ivf_join_serve_vectorized_parity``;
    - any group containing a non-finite cosine (zero-norm vector)
      emits ALL its pairs instead of cutting, because numpy's NaN
      ordering differs from the JVM window's NaN-first rule — the
      downstream window then applies the JVM ordering to the full
      group exactly as the join path would.

    Scale shape: one task per (cell, salt) group; group payload is the
    cell slice plus every query probing the cell (the quadratic stage
    IVF exists to bound — ``n_centroids`` must grow with the corpus,
    the same contract the join path has). The accumulator is blocked at
    ``_COGROUP_Q_BLOCK`` query rows so scratch memory stays flat.
    """
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
    _id_np = np.int64 if id_type in ("bigint", "int", "long", "smallint") else object
    empty = pd.DataFrame(
        {
            "query_id": np.array([], dtype=_id_np),
            "neighbor_id": np.array([], dtype=_id_np),
            "cos_sim": np.array([], dtype=np.float64),
        }
    )

    def score(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return empty
        # column order = neighbor_id ascending, so a STABLE argsort on
        # -cos alone realizes the (cos desc, neighbor asc) total order
        cpdf = cpdf.sort_values("neighbor_id", kind="stable")
        Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64, copy=False)
        C = np.stack(cpdf["cv"].to_numpy()).astype(np.float64, copy=False)
        qids = qpdf["query_id"].to_numpy()
        nids = cpdf["neighbor_id"].to_numpy()
        dim = Q.shape[1]
        qn = np.zeros(len(Q))
        vn = np.zeros(len(C))
        for i in range(dim):
            qn += Q[:, i] * Q[:, i]
            vn += C[:, i] * C[:, i]
        qn = np.sqrt(qn)
        vn = np.sqrt(vn)
        def cos_chunk(Qb: np.ndarray, qb_n: np.ndarray, c0: int, c1: int):
            # chunked cos values are BIT-IDENTICAL to the unchunked
            # matrix's slices: each element accumulates the same scalar
            # products over the same dim order and divides by the same
            # per-element norm product
            acc = np.zeros((len(Qb), c1 - c0))
            for i in range(dim):
                acc += np.outer(Qb[:, i], C[c0:c1, i])
            return acc / (qb_n[:, None] * vn[None, c0:c1])

        out_q, out_n, out_c = [], [], []
        for s in range(0, len(Q), _COGROUP_Q_BLOCK):
            Qb = Q[s : s + _COGROUP_Q_BLOCK]
            qb_ids = qids[s : s + _COGROUP_Q_BLOCK]
            qb_n = qn[s : s + _COGROUP_Q_BLOCK]
            n_q = len(Qb)
            kk = min(k + 1, len(C))  # +1 absorbs the self slot
            # candidate axis blocked too (r16 advice): score C in
            # chunks and merge per-row top-kk across chunks — stable
            # argsort on the concat keeps the (cos desc, neighbor asc)
            # total order because earlier chunks (lower neighbor ids,
            # C is sorted by id) precede later ones in the concat
            m_vals = np.zeros((n_q, 0))
            m_cols = np.zeros((n_q, 0), dtype=np.int64)
            nonfinite = False
            for c0 in range(0, len(C), _COGROUP_C_BLOCK):
                c1 = min(c0 + _COGROUP_C_BLOCK, len(C))
                cos = cos_chunk(Qb, qb_n, c0, c1)
                if not np.isfinite(cos).all():
                    nonfinite = True
                    break
                cos_m = np.where(
                    qb_ids[:, None] == nids[None, c0:c1], -np.inf, cos
                )
                t = min(kk, c1 - c0)
                order = np.argsort(-cos_m, axis=1, kind="stable")[:, :t]
                cat_v = np.concatenate(
                    [m_vals, np.take_along_axis(cos_m, order, axis=1)], axis=1
                )
                cat_c = np.concatenate([m_cols, order + c0], axis=1)
                sel = np.argsort(-cat_v, axis=1, kind="stable")[:, :kk]
                m_vals = np.take_along_axis(cat_v, sel, axis=1)
                m_cols = np.take_along_axis(cat_c, sel, axis=1)
            if nonfinite:
                # degenerate group (zero-norm / non-finite vector):
                # emit ALL pairs, re-scoring chunk by chunk (rare path —
                # the downstream window applies the JVM NaN-first rule)
                for c0 in range(0, len(C), _COGROUP_C_BLOCK):
                    c1 = min(c0 + _COGROUP_C_BLOCK, len(C))
                    cos = cos_chunk(Qb, qb_n, c0, c1)
                    keep = qb_ids[:, None] != nids[None, c0:c1]
                    r, c = np.where(keep)
                    out_q.append(qb_ids[r])
                    out_n.append(nids[c0:c1][c])
                    out_c.append(cos[keep])
                continue
            width = m_vals.shape[1]
            rows = np.repeat(np.arange(n_q), width)
            cols = m_cols.reshape(-1)
            vals = m_vals.reshape(-1)
            keep = np.isfinite(vals)
            # trim past rank k among KEPT candidates per row (the +1
            # slot only exists to absorb the self pair's -inf; when all
            # k+1 are real candidates the last one must go)
            kept_rank = np.cumsum(keep.reshape(n_q, width), axis=1).reshape(-1)
            keep &= kept_rank <= k
            out_q.append(qb_ids[rows[keep]])
            out_n.append(nids[cols[keep]])
            out_c.append(vals[keep])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q) if out_q else [],
                "neighbor_id": np.concatenate(out_n) if out_n else [],
                "cos_sim": np.concatenate(out_c) if out_c else [],
            }
        )

    return (
        qq.groupBy("cell", "__salt")
        .cogroup(cells_s.groupBy("cell", "__salt"))
        .applyInPandas(score, schema=out_schema)
    )


def _cogroup_threshold_pairs(
    a_side: DataFrame,
    b_side: DataFrame,
    keys: list,
    threshold: float,
    id_type: str,
    emit_key_type: str | None = None,
) -> DataFrame:
    """Within-group pair verification ``(id_a < id_b, cos >= threshold)``
    as a cogrouped vectorized pass — semdedup's quadratic stage without
    the per-pair interpreted fold.

    Both sides arrive keyed the same way the salted self-join was
    (``keys`` = [cluster] or [cluster, __ps]); each group is scored with
    sequential-dim accumulation (bit-identical to the JVM fold — see
    :func:`_cogroup_topk_scores`) and the filter mirrors Spark's NaN
    semantics exactly: ``NaN >= t`` is TRUE in Spark's total order, so
    NaN cosines (zero-norm vectors) pass here too. Expects columns
    ``(id, v)`` on both sides plus the key columns; emits
    ``(id_a, id_b)``, prefixed with the FIRST key column when
    ``emit_key_type`` names its Spark type (so key-partitioned
    consumers need no re-join to recover the key)."""
    out_schema = f"id_a {id_type}, id_b {id_type}"
    if emit_key_type is not None:
        out_schema = f"{keys[0]} {emit_key_type}, " + out_schema
    _id_np = np.int64 if id_type in ("bigint", "int", "long", "smallint") else object
    empty = pd.DataFrame(
        {"id_a": np.array([], dtype=_id_np), "id_b": np.array([], dtype=_id_np)}
    )
    if emit_key_type is not None:
        empty.insert(0, keys[0], pd.Series([], dtype="int64"))

    # a self-cogroup (semdedup feeds the SAME frame to both sides) hits
    # Spark's ambiguous-self-join analysis; re-aliasing every b-side
    # column mints fresh attribute ids, and the cogroup matches groups
    # by key VALUE positionally, so renamed keys pair up fine
    b_keys = [f"__bk{i}" for i in range(len(keys))]
    b_side = b_side.select(
        *[F.col(k).alias(bk) for k, bk in zip(keys, b_keys)],
        F.col("id").alias("__bid"),
        F.col("v").alias("__bv"),
    )

    def verify(apdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if len(apdf) == 0 or len(bpdf) == 0:
            return empty
        key_val = apdf[keys[0]].iloc[0] if emit_key_type is not None else None
        A = np.stack(apdf["v"].to_numpy()).astype(np.float64, copy=False)
        B = np.stack(bpdf["__bv"].to_numpy()).astype(np.float64, copy=False)
        a_ids = apdf["id"].to_numpy()
        b_ids = bpdf["__bid"].to_numpy()
        dim = A.shape[1]
        an = np.zeros(len(A))
        bn = np.zeros(len(B))
        for i in range(dim):
            an += A[:, i] * A[:, i]
            bn += B[:, i] * B[:, i]
        an = np.sqrt(an)
        bn = np.sqrt(bn)
        out_a, out_b = [], []
        for s in range(0, len(A), _COGROUP_Q_BLOCK):
            Ab = A[s : s + _COGROUP_Q_BLOCK]
            ab_ids = a_ids[s : s + _COGROUP_Q_BLOCK]
            ab_n = an[s : s + _COGROUP_Q_BLOCK]
            # b axis blocked too (r16 advice — bounded scratch on both
            # axes); the threshold filter is per-element so chunking
            # needs no merge step, and chunked cos values are
            # bit-identical to the unchunked matrix's slices
            for c0 in range(0, len(B), _COGROUP_C_BLOCK):
                c1 = min(c0 + _COGROUP_C_BLOCK, len(B))
                acc = np.zeros((len(Ab), c1 - c0))
                for i in range(dim):
                    acc += np.outer(Ab[:, i], B[c0:c1, i])
                cos = acc / (ab_n[:, None] * bn[None, c0:c1])
                keep = (ab_ids[:, None] < b_ids[None, c0:c1]) & (
                    (cos >= threshold) | np.isnan(cos)
                )
                r, c = np.where(keep)
                out_a.append(ab_ids[r])
                out_b.append(b_ids[c0:c1][c])
        res = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        if emit_key_type is not None:
            # the group key rides along (constant within a group) so
            # key-partitioned consumers (components_within) need no
            # re-join to recover it
            res.insert(0, keys[0], key_val)
        return res

    return (
        a_side.groupBy(*keys)
        .cogroup(b_side.groupBy(*b_keys))
        .applyInPandas(verify, schema=out_schema)
    )


def _salted(df: DataFrame, key_col: str, salt: int) -> DataFrame:
    """Corpus side of a de-skewed cell join: a deterministic salt from
    the row id. A cell equi-join has only ``n_centroids`` distinct keys
    — unsalted, each inverted list funnels through ONE reducer; salted,
    a list fans out over ``salt`` reducers (AQE skew-join splitting
    helps too, but the salt keeps the plan robust when AQE is off)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt)).cast("int")
    )


def _replicated(q: DataFrame, salt: int) -> DataFrame:
    """Query side of the de-skewed join: each probe row replicates over
    every salt value (queries × nprobe × salt rows — the cheap side)."""
    return q.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))


def ivf_query_index_join(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_corpus: DataFrame | None = None,
    rerank: int | None = None,
    salt: int = 8,
    prune_cells: bool = True,
) -> DataFrame:
    """Serve a persisted :func:`build_ivf_index` layout with a
    DATAFRAME-sized query set — same results as :func:`ivf_query_index`
    (pinned by ``test_ivf_index_join_serve_matches_collect_path``), no
    driver collect of the query side:

    - cell assignment is the same Arrow-batched
      :func:`nearest_cells_udf` (centroid matrix in the closure, O(1)
      in n_centroids), exploded to one row per (query, probed cell);
    - the candidate match is a salted equi-join queries×cells on
      ``(cell, __salt)`` — Catalyst/AQE picks broadcast for a small
      query frame and a de-skewed shuffle join for a large one;
    - ``prune_cells`` keeps static partition pruning: the distinct
      probed-cell set is bounded by ``n_centroids`` (a model-sized
      collect, never query- or corpus-sized); disable it for
      corpus-vs-corpus serves that probe every cell anyway;
    - scoring is JVM-side (:func:`cosine` / :func:`_dequantized_cos`
      higher-order expressions — no Python in the hot path), top-k a
      per-query window, exactly the collect path's cut.

    SQ8 layouts quantize the query side with the same
    :func:`scalar_quantize` expressions (distributed, not collected);
    pass ``rerank_corpus`` to recover exactness as in
    :func:`ivf_query_index`."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent_mat = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn(
        "cell", F.explode(nearest_cells_udf(cent_mat, nprobe)(F.col("qv")))
    )
    cells = spark.read.parquet(f"{path}/cells")
    if prune_cells and nprobe < len(cent_mat):  # fullprobe reads every cell
        probe_cells = sorted(
            r["cell"] for r in q.select("cell").distinct().collect()
        )
        cells = cells.where(F.col("cell").isin(probe_cells))
    # Spread a NARROW index scan across the cluster: a young/compacted
    # index has one parquet file per cell (n_centroids files), so the
    # per-pair scoring stage — the serve's entire cost — would run on
    # n_centroids tasks no matter how many cores exist (the salt only
    # de-skews SHUFFLE joins; under a broadcast of the query side the
    # stream stays at scan parallelism). File count is metadata-only
    # (the _documents()/compactor probe); at scale each cell spans many
    # files/splits and no repartition is inserted. Hash on the row id
    # (deterministic, no sort-before-repartition) — placement does not
    # affect results, the top-k window re-keys by query later.
    target = spark.sparkContext.defaultParallelism
    _cogrouped = not prune_cells and "qvec" not in cells.columns
    if not _cogrouped and 0 < len(cells.inputFiles()) < target:
        # (the cogrouped path re-shuffles by (cell, salt) anyway — an
        # extra spread exchange would be pure waste there)
        cells = cells.repartition(target, F.col("vec_id"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    if "qvec" in cells.columns:  # SQ8 layout
        qvec = F.col("qv")
        amax = F.array_max(F.transform(qvec, lambda x: F.abs(x)))
        qscale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
        qq = _replicated(
            q.select(
                "query_id",
                "qv",
                "cell",
                F.transform(
                    qvec, lambda x: F.round(x / qscale).cast("int")
                ).alias("q_qvec"),
                qscale.alias("q_scale"),
                norm(qvec).alias("q_vnorm"),
            ),
            salt,
        )
        approx = (
            _salted(cells, "vec_id", salt)
            .withColumnRenamed("vec_id", "neighbor_id")
            .join(qq, on=["cell", "__salt"])
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("approx_cos", _dequantized_cos())
        )
        if rerank_corpus is None:
            scored = approx.withColumn("cos_sim", F.col("approx_cos"))
        else:
            n_cand = rerank or 10 * k
            w_a = W.partitionBy("query_id").orderBy(
                F.col("approx_cos").desc(), F.col("neighbor_id")
            )
            cands = (
                approx.withColumn("arank", F.row_number().over(w_a))
                .where(F.col("arank") <= n_cand)
                .select("neighbor_id", "query_id", "qv")
            )
            exact_c = rerank_corpus.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            )
            scored = cands.join(exact_c, "neighbor_id").withColumn(
                "cos_sim", cosine(F.col("qv"), F.col("cv"))
            )
    elif not prune_cells:
        # corpus-vs-corpus serve (knn_graph: every cell probed, the
        # query side is corpus-sized) — score per (cell, salt) GROUP
        # with the vectorized cogrouped scorer instead of per PAIR with
        # the interpreted fold. Same shuffle keys and bytes as the
        # salted equi-join; bit-identical values and rows (sequential-
        # dim accumulation + same-total-order per-group cut — see
        # _cogroup_topk_scores). The 56 s of fold task-time this stage
        # cost at sf0.1 drops to 64 numpy passes.
        scored = _cogroup_topk_scores(
            _salted(cells, "vec_id", salt).select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                "cell",
                "__salt",
            ),
            _replicated(q, salt),
            k,
            _col_type(queries, id_col),
        )
    else:
        # norms precomputed ONCE PER SIDE before the join: the naive
        # cosine(qv, cv) re-evaluates sqrt(Σx²) for BOTH vectors on
        # every candidate PAIR — for a probe-batch serve the broadcast
        # equi-join keeps the index scan shuffle-free, which the
        # cogrouped scorer above cannot (its groupBy must move the
        # probed cells), so the JVM pair path stays the small-query
        # default. dot/(qn·vn) is bit-identical arithmetic (same sqrt,
        # same multiply), just hoisted above the join.
        scored = (
            _salted(cells, "vec_id", salt)
            .select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                norm(F.col("v")).alias("__vn"),
                "cell",
                "__salt",
            )
            .join(
                _replicated(
                    q.withColumn("__qn", norm(F.col("qv"))), salt
                ),
                on=["cell", "__salt"],
            )
            .where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn(
                "cos_sim",
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__vn")),
            )
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def ivfpq_query_index_join(
    spark,
    path: str,
    queries: DataFrame,
    rerank_corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank_pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int = 8,
    prune_cells: bool = True,
) -> DataFrame:
    """Serve a persisted :func:`build_ivfpq_index` layout with a
    DATAFRAME-sized query set — the join twin of
    :func:`ivfpq_query_index` (same probe rule, same ADC math, same
    exact-rerank contract; pinned by
    ``test_ivfpq_index_join_serve_matches_collect_path``):

    - the probe set comes from the SAME normalized rule as every other
      IVF-PQ consumer (:func:`_ivfpq_probe` over Arrow batches — the
      r11 scale-invariance fix carries over by construction);
    - candidates come from the salted equi-join queries×codes on
      ``(cell, __salt)`` — the join IS the probe mask, so no in-UDF
      isin over a collected query list;
    - ADC runs in a vectorized pandas UDF over the joined frame with
      only the codebooks (m × n_codes × d_sub doubles) in the closure:
      per batch, gather each row's code vectors and dot them against
      the row's normalized query sub-vectors (same
      dot-over-d-then-sum-over-s association as the LUT path), plus
      the q̂·ĉ_cell bias for residual layouts;
    - global ADC top-``max(k, rerank_pool)`` per query (window), then
      the exact cosine rerank joins ``rerank_corpus`` and the query
      frame by key — never broadcasting or collecting the query side.
    """
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    cent = np.asarray([r["vector"] for r in cent_rows], dtype=np.float64)
    cb_rows = spark.read.parquet(f"{path}/codebooks").orderBy("s", "c").collect()
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    m, n_c = meta["m_subspaces"], meta["n_codes"]
    residual = bool(meta["residual"])
    cb = np.asarray(
        [r["vector"] for r in cb_rows], dtype=np.float64
    ).reshape(m, n_c, -1)
    d_sub = cb.shape[2]
    cent_hat = _normalized_rows(cent)

    @pandas_udf(ArrayType(IntegerType()))
    def probe_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            qm = _normalized_rows(
                np.stack(vecs.to_numpy()).astype(np.float64)
            )
            yield pd.Series(
                list(_ivfpq_probe(qm, cent, nprobe).astype(np.int32))
            )

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("cell", F.explode(probe_udf(F.col("qv"))))
    encoded = spark.read.parquet(f"{path}/cells")
    if prune_cells and nprobe < len(cent):  # fullprobe reads every cell
        probe_cells = sorted(
            r["cell"] for r in q.select("cell").distinct().collect()
        )
        encoded = encoded.where(F.col("cell").isin(probe_cells))
    # spread a narrow (one-file-per-cell) index scan — see the same
    # probe in ivf_query_index_join: the ADC scoring stage otherwise
    # caps at n_centroids tasks under a broadcast query side
    target = spark.sparkContext.defaultParallelism
    if 0 < len(encoded.inputFiles()) < target:
        encoded = encoded.repartition(target, F.col("id"))

    sub_idx = np.arange(m)[None, :]

    @pandas_udf(DoubleType())
    def adc_udf(
        qvs: pd.Series, codes: pd.Series, cells_s: pd.Series
    ) -> pd.Series:
        qm = _normalized_rows(np.stack(qvs.to_numpy()).astype(np.float64))
        b = qm.shape[0]
        cd = np.stack(codes.to_numpy()).astype(np.int64)  # (b, m)
        sel = cb[sub_idx, cd]  # (b, m, d_sub)
        sims = (qm.reshape(b, m, d_sub) * sel).sum(axis=2).sum(axis=1)
        if residual:
            cells_arr = cells_s.to_numpy().astype(np.int64)
            sims = sims + (qm * cent_hat[cells_arr]).sum(axis=1)
        return pd.Series(sims)

    pool = max(k, rerank_pool)
    scored = (
        _salted(encoded, "id", salt)
        .select(
            F.col("id").alias("neighbor_id"), "codes", "cell", "__salt"
        )
        .join(_replicated(q, salt), on=["cell", "__salt"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "adc_score", adc_udf(F.col("qv"), F.col("codes"), F.col("cell"))
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= pool
    )
    c = rerank_corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    exact = (
        ranked.select("query_id", "neighbor_id", "qv")
        .join(c, "neighbor_id")
        .withColumn(
            "cos_sim", cosine(F.col("qv"), F.col("cv"))
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def knn_graph(
    spark,
    path: str,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int = 8,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over the whole corpus — every row's
    top-``k`` cosine neighbors as ``(query_id, neighbor_id, cos_sim,
    rank)`` edges — the substrate for graph-based dedup, diversity
    analysis, and label propagation at corpus scale.

    This is the corpus-vs-corpus workload the join serve exists for: the
    corpus plays BOTH sides of :func:`ivf_query_index_join`, so the
    query side never collects to the driver (a corpus-sized
    ``collect()`` is exactly what the guarded probe-batch paths refuse).
    Cost shape: each row scores against its ``nprobe`` / ``n_centroids``
    fraction of the corpus through the salted cell equi-join — the IVF
    partitioning is what keeps this off the all-pairs n² cliff, and
    ``nprobe`` is the recall/cost dial. ``prune_cells`` is off: a corpus
    query set probes essentially every cell, so the distinct-cell
    pre-job would be a wasted pass."""
    return ivf_query_index_join(
        spark,
        path,
        corpus,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        salt=salt,
        prune_cells=False,
    )
