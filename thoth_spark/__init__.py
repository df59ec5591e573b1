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

from thoth_spark import service as _service
from thoth_spark.anomaly.models import collect_timeseries
from thoth_spark.anomaly.optimization import OptimizationFailedError
from thoth_spark.anomaly.optimization import optimize as _optimize_core
from thoth_spark.anomaly.scoring import score as _score_core
from thoth_spark.profiler import (
    DefaultProfilingBuilder,
    Granularity,
    ProfilingBuilder,
    SimpleProfilingBuilder,
)
from thoth_spark.profiler import profile as _profile_core
from thoth_spark.dashboard_html import export_dashboard_html, render_dashboard_html
from thoth_spark.quality import AnomalousScore, LogHandler, NotificationHandler
from thoth_spark.quality import assess_quality as _assess_quality_core
from thoth_spark.repository import DatasetValidationError, MetricsRepository
from thoth_spark.service import (
    ThothServiceError,
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


# ---------------------------------------------------------------------------
# Root-level `profile` / `optimize` / `score` / `assess_quality`: the
# reference exports its repo-persisted SERVICE flows under these names
# (``thoth/__init__.py:48-62`` re-exporting ``service_layer.py:157,245,
# 307,355``), while this package's composable core functions are
# DataFrame-first. The two call shapes are disjoint — the service flows
# lead with a dataset URI (or pass ``repo=``), the core ones with a
# metrics/profiling DataFrame — so one type-dispatching wrapper serves
# both: reference code like ``thoth.optimize("my://uri", repo=repo)``
# ports verbatim, and ``optimize(metrics_df, confidence=0.9)`` keeps
# working.
# ---------------------------------------------------------------------------


def profile(df, x=None, *args, **kwargs):
    """``profile(df, ts_column, ...)`` (core) or
    ``profile(df, dataset_uri, [profiling_builder,] repo=...)``
    (service, repo-persisted — positional order matches reference
    ``service_layer.profile``, so ``profile(df, uri, builder,
    repo=repo)`` ports verbatim)."""
    if "repo" in kwargs:
        if x is None and not args:  # fully-keyword service call
            return _service.profile(df, **kwargs)
        return _service.profile(df, x, *args, **kwargs)
    if args and isinstance(args[-1], MetricsRepository):
        # reference-style trailing positional repo — remap to kw-only
        return _service.profile(df, x, *args[:-1], repo=args[-1])
    if x is None:
        # keyword call shape, e.g. profile(df, ts_column="ts"): never
        # forward the placeholder positionally (it would collide)
        return _profile_core(df, *args, **kwargs)
    return _profile_core(df, x, *args, **kwargs)


def optimize(x, *args, **kwargs):
    """``optimize(metrics_df, ...)`` (core) or
    ``optimize(dataset_uri, repo=...)`` (service, repo-persisted)."""
    if isinstance(x, str):
        return _service.optimize(x, *args, **kwargs)
    return _optimize_core(x, *args, **kwargs)


def score(x, *args, **kwargs):
    """``score(history_df, optimization)`` (core) or
    ``score(dataset_uri, ts, repo=...)`` (service, repo-persisted)."""
    if isinstance(x, str):
        return _service.score(x, *args, **kwargs)
    return _score_core(x, *args, **kwargs)


def assess_quality(x, *args, **kwargs):
    """``assess_quality(optimization_df, scoring_df, ...)`` (core) or
    ``assess_quality(dataset_uri, ts, repo=...)`` (service)."""
    if isinstance(x, str):
        return _service.assess_quality(x, *args, **kwargs)
    return _assess_quality_core(x, *args, **kwargs)

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
    "ThothServiceError",
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
