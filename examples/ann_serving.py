"""Persisted-ANN serving lifecycle on the bundled test corpus.

Run:  python examples/ann_serving.py  [sf_dir]

The index lifecycle a 10⁹-vector deployment runs, at fixture scale:

1. BUILD — `build_ivfpq_index`: coarse-quantize the corpus into cells,
   PQ-encode (residual codes, the FAISS IndexIVFPQ recipe), persist as
   ONE PARQUET DIRECTORY PER INVERTED LIST plus the tiny
   centroid/codebook/meta frames. The expensive shuffle is paid once.
2. SERVE — `ivfpq_query_index`: per query, probe the nprobe nearest
   cells; the file listing PRUNES every other partition
   (PartitionFilters), the ADC scan reads m small ints per row instead
   of dim floats, and the global top candidates re-rank exactly
   against the float vectors.
3. INGEST — `ivf_index_append` (float-cell layout): new vectors join
   under the FROZEN coarse quantizer via dynamic partition append —
   O(batch) cost, no rebuild; the next probe sees the union.
4. EVALUATE — recall@k of the pruned serve against exact brute force,
   the number every ANN deployment tunes nprobe/rerank_pool against.

Every stage is deterministic given the data, and the exactness of the
storage roundtrip is hash-gated in the driver suite
(`similarity_topk_ivfpq_index_fullprobe`,
`similarity_topk_ivf_index_append_fullprobe`).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from thoth_spark import get_spark
from thoth_spark.operators import similarity
from thoth_spark.sources import load_table


def run(spark, sf_dir: str, root: str | None = None) -> dict:
    """Execute the lifecycle; returns the stage facts the integration
    test (tests/test_operators.py::test_ann_serving_example) asserts."""
    if root is None:
        root = tempfile.mkdtemp(prefix="ann_serving_")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )

    # 1. build the compressed serving index
    ivfpq_dir = os.path.join(root, "ivfpq")
    similarity.build_ivfpq_index(
        emb, ivfpq_dir, n_centroids=8, m_subspaces=8, n_codes=16, residual=True
    )
    n_cells = (
        spark.read.parquet(f"{ivfpq_dir}/cells").select("cell").distinct().count()
    )

    # 2. pruned serve + 4. recall evaluation
    served = similarity.ivfpq_query_index(
        spark, ivfpq_dir, queries, rerank_corpus=emb, k=5, nprobe=5,
        rerank_pool=50,
    ).select("query_id", "neighbor_id")
    recall = exact.join(served, ["query_id", "neighbor_id"]).count() / exact.count()

    # 3. incremental ingest on the float-cell layout: build on half,
    # append the rest, verify the union serves
    ivf_dir = os.path.join(root, "ivf")
    similarity.build_ivf_index(
        emb.where(F.col("vec_id") % 2 == 0), ivf_dir, n_centroids=8
    )
    similarity.ivf_index_append(spark, ivf_dir, emb.where(F.col("vec_id") % 2 == 1))
    union_rows = spark.read.parquet(f"{ivf_dir}/cells").count()
    full_serve = similarity.ivf_query_index(
        spark, ivf_dir, queries, k=5, nprobe=8
    ).select("query_id", "neighbor_id")
    full_recall = (
        exact.join(full_serve, ["query_id", "neighbor_id"]).count() / exact.count()
    )

    return {
        "corpus": emb.count(),
        "n_cells": n_cells,
        "pruned_recall_at_5": recall,
        "appended_rows": union_rows,
        "fullprobe_recall_at_5": full_recall,
        "root": root,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8, app_name="ann-serving")
    r = run(spark, sf_dir)
    print(f"corpus:               {r['corpus']} vectors")
    print(f"index cells:          {r['n_cells']} (one parquet dir each)")
    print(f"pruned recall@5:      {r['pruned_recall_at_5']:.2f} (nprobe=5/8, pool=50)")
    print(f"rows after append:    {r['appended_rows']} (half built + half ingested)")
    print(f"fullprobe recall@5:   {r['fullprobe_recall_at_5']:.2f} (must be 1.0)")
    print(f"index root:           {r['root']}")
    spark.stop()


if __name__ == "__main__":
    main()
