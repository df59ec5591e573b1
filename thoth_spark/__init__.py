"""thoth_spark — a PySpark-native data-profiling & anomaly-monitoring engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
project ``rafaelleinio/thoth`` (profiling-based data-quality monitoring):

- **Profiler** (flow A): one-pass ``groupBy(date_trunc(ts)).agg(...)``
  computing every analyzer for every column for every time partition in a
  single Spark job (the reference runs one JVM Deequ job per partition —
  ``/root/reference/thoth/profiler.py:313-336``).
- **Anomaly layer** (flow B): forward-chaining cross-validation of rolling
  window forecasters expressed entirely as window functions partitioned by
  metric key — embarrassingly parallel across metrics.
- **Quality assessment** (flow C): score-vs-threshold join + notification
  handlers.
- **Repository**: long-format metrics tables on partitioned parquet.
- **Scale operators** (net-new): dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, multimodal
  column plumbing — designed for 100 TB inputs.
"""

from thoth_spark.anomaly.models import collect_timeseries
from thoth_spark.anomaly.optimization import OptimizationFailedError, optimize
from thoth_spark.anomaly.scoring import score
from thoth_spark.profiler import (
    DefaultProfilingBuilder,
    Granularity,
    ProfilingBuilder,
    SimpleProfilingBuilder,
    profile,
)
from thoth_spark.dashboard_html import export_dashboard_html, render_dashboard_html
from thoth_spark.quality import AnomalousScore, LogHandler, NotificationHandler, assess_quality
from thoth_spark.repository import DatasetValidationError, MetricsRepository
from thoth_spark.service import (
    add_dataset,
    assess_new_ts,
    get_dataset,
    get_datasets,
    get_optimization,
    get_scoring,
    init_db,
    is_db_initialized,
    profile_create,
    profile_create_optimize,
    select_profiling,
)
from thoth_spark.session import get_spark
from thoth_spark.ui import DashboardServer, serve_dashboard

__all__ = [
    "AnomalousScore",
    "DashboardServer",
    "DatasetValidationError",
    "DefaultProfilingBuilder",
    "Granularity",
    "LogHandler",
    "MetricsRepository",
    "NotificationHandler",
    "OptimizationFailedError",
    "ProfilingBuilder",
    "SimpleProfilingBuilder",
    "add_dataset",
    "assess_new_ts",
    "assess_quality",
    "collect_timeseries",
    "export_dashboard_html",
    "get_dataset",
    "get_datasets",
    "get_optimization",
    "get_scoring",
    "get_spark",
    "init_db",
    "is_db_initialized",
    "optimize",
    "profile",
    "profile_create",
    "profile_create_optimize",
    "render_dashboard_html",
    "score",
    "select_profiling",
    "serve_dashboard",
]
