"""One-pass Spark-native profiler.

Computes every analyzer for every column for every time partition in a
single ``groupBy(date_trunc(ts)).agg(...)`` job (plus one small job per
column that needs per-value frequencies), emitting a long/tidy metrics
DataFrame ``(ts, entity, instance, name, value)``.

The reference (``/root/reference/thoth/profiler.py:282-338``) collects the
distinct timestamps to the driver and runs one Deequ job per partition;
this rebuild expresses the same semantics declaratively so Catalyst gives
partial aggregation, whole-stage codegen and AQE for free, and the job
count is independent of the number of time partitions — the property that
matters at 100 TB.
"""

from thoth_spark.profiler.analyzers import (
    Analyzer,
    ApproxCountDistinct,
    ApproxQuantiles,
    ApproxTopK,
    Completeness,
    Compliance,
    Correlation,
    CountDistinct,
    Distinctness,
    Entropy,
    ExactQuantiles,
    GroupingAnalyzer,
    Histogram,
    InferredTypes,
    KLLQuantiles,
    Maximum,
    MaxLength,
    Mean,
    Minimum,
    MinLength,
    MutualInformation,
    PatternMatch,
    Size,
    StandardDeviation,
    Sum,
    Uniqueness,
    UniqueValueRatio,
)
from thoth_spark.profiler.check import Check, run_check
from thoth_spark.profiler.builder import (
    DefaultProfilingBuilder,
    ExactProfilingBuilder,
    ProfilingBuilder,
    SimpleProfilingBuilder,
    Type2Analyzers,
)
from thoth_spark.profiler.profile import Granularity, fill_gaps, profile

__all__ = [
    "Analyzer",
    "ApproxCountDistinct",
    "ApproxTopK",
    "Check",
    "ApproxQuantiles",
    "Completeness",
    "Compliance",
    "Correlation",
    "CountDistinct",
    "DefaultProfilingBuilder",
    "Distinctness",
    "Entropy",
    "ExactProfilingBuilder",
    "ExactQuantiles",
    "Granularity",
    "GroupingAnalyzer",
    "Histogram",
    "InferredTypes",
    "KLLQuantiles",
    "MaxLength",
    "Maximum",
    "Mean",
    "MinLength",
    "Minimum",
    "MutualInformation",
    "PatternMatch",
    "ProfilingBuilder",
    "SimpleProfilingBuilder",
    "Size",
    "StandardDeviation",
    "Sum",
    "Type2Analyzers",
    "Uniqueness",
    "run_check",
    "UniqueValueRatio",
    "fill_gaps",
    "profile",
]
