"""First-class distributed K-Means refinement over embedding columns.

:func:`thoth_spark.operators.similarity.coarse_centroids` is the
PRODUCTION quantizer-training path (pyspark.ml KMeans on a bounded
sample — the right recipe when the centroids only need to be good, as
in IVF/SemDeDup). This module adds the complementary operator a
curation pipeline needs when the centroids must be *accountable*: an
explicit full-corpus Lloyd refinement from caller-supplied (or
deterministically seeded) initial centroids, every iteration a plain
DataFrame job, with the update arithmetic pinned so the whole run is
engine-replayable (the `kmeans_refine_embeddings` driver query replays
it in DuckDB SQL, iterations unrolled).

Scale shape (100 TB lens): per iteration — one Arrow-batched
nearest-centroid matmul pass (centroid matrix in the UDF closure, plan
O(1) in k; one BLAS matmul per batch), then one partial-aggregable
``groupBy(cluster, pos).avg`` over the posexploded vectors (map-side
combine collapses each partition to ≤ k×dim rows before the shuffle,
so a degenerate giant cluster never funnels through one reducer). The
driver collects exactly k×dim mean cells per iteration — the same
order of driver traffic as the centroid closure itself, which any
closure-shipped k-means already pays; k×dim must fit in executor
memory regardless, so the collect adds no new ceiling.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thoth_spark.operators.similarity import _as_double, nearest_cells_udf


def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> np.ndarray:
    """Deterministic init: the vectors of the ``k`` smallest ids (a
    bounded k-row collect). Not a quality init — it is the
    REPRODUCIBLE one, for refinement runs that must be replayable;
    pass :func:`similarity.coarse_centroids` output when quality
    matters more than replay."""
    rows = (
        df.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .orderBy("id")
        .limit(k)
        .collect()
    )
    return np.asarray([r.v for r in rows], dtype=np.float64)


def lloyd_refine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    k: int = 8,
    iterations: int = 2,
    round_decimals: int | None = 6,
    stats: dict | None = None,
) -> DataFrame:
    """Lloyd k-means: ``iterations`` rounds of (assign → mean-update),
    then a final assignment against the refined centroids. Returns
    ``(id, cluster)``; pass ``stats`` to receive
    ``{"centroids": ndarray, "moved": [per-iteration max centroid
    shift]}``.

    Determinism contract (what makes the SQL replay exact): assignment
    is argmin over ``||c||² − 2x·c`` with ties to the LOWER cluster id
    (similarity.nearest_cells_udf's stable argsort); an empty cluster
    keeps its previous centroid; each updated mean is rounded to
    ``round_decimals`` INSIDE the Spark aggregation (``F.round`` —
    HALF_UP, the same rule DuckDB's ``round`` applies), so the centroid
    matrices both engines iterate on are bit-identical and
    sum-order noise (Spark partial aggregation vs sequential SQL
    summation, ~1 ulp) is quashed three orders of magnitude below the
    rounding grid. ``round_decimals=None`` disables the pinning for
    callers that prefer raw means over replayability.
    """
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=False)
    cent = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else seed_centroids(df, id_col, vec_col, k)
    )
    moved = []
    mean_expr = (
        F.round(F.avg("x"), round_decimals)
        if round_decimals is not None
        else F.avg("x")
    ).alias("m")
    for _ in range(iterations):
        asg = base.withColumn("cluster", nearest_cells_udf(cent, 1)(F.col("v"))[0])
        cells = (
            asg.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(mean_expr)
            .collect()  # bounded: ≤ k×dim rows (the closure-matrix size)
        )
        new = cent.copy()  # empty clusters keep their previous centroid
        for r in cells:
            new[r.cluster, r.pos] = r.m
        moved.append(float(np.abs(new - cent).max()))
        cent = new
    out = base.withColumn("cluster", nearest_cells_udf(cent, 1)(F.col("v"))[0])
    if stats is not None:
        stats["centroids"] = cent
        stats["moved"] = moved
    return out.select("id", "cluster")
