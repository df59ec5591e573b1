"""Scale operators for large training-data pipelines (net-new vs. the
reference — SURVEY.md §7.5): deduplication, similarity search, text
analysis, multimodal column plumbing, and relational building blocks.

Every operator is designed shuffle-first for 100 TB inputs: candidate
generation via hash bucketing (never all-pairs), frequency caps on skewed
join keys, broadcast for small sides, and JVM-side expressions (no Python
on the hot path except clearly-marked Pandas-UDF decode stubs).
"""

from thoth_spark.operators import (
    classifier,
    clustering,
    curation,
    dedup,
    graph,
    lm,
    membership,
    multimodal,
    relational,
    retrieval,
    sampling,
    similarity,
    storage,
    text,
    tokenizer,
)

__all__ = [
    "classifier",
    "clustering",
    "curation",
    "dedup",
    "graph",
    "lm",
    "membership",
    "multimodal",
    "relational",
    "retrieval",
    "sampling",
    "similarity",
    "storage",
    "text",
    "tokenizer",
]
