"""Dashboard deep-links + a thin, dependency-free dashboard consumer.

Parity with the reference's Streamlit dashboard plumbing
(``/root/reference/thoth/util/dashboard.py:11-21`` for the link format,
``/root/reference/ui.py:97-293`` for the three views): the engine ships
the *data* side — plot-ready DataFrames from :mod:`thoth_spark.viz` — and
this module supplies the link format notification handlers embed and a
``dashboard_page`` entry point any UI (Streamlit, notebook, BI tool) can
render directly.
"""

from __future__ import annotations

import os
from urllib.parse import quote, urlencode

from pyspark.sql import DataFrame

from thoth_spark import viz

#: View names — same strings as the reference dashboard sidebar.
PROFILING_VIEW = "👤 Profiling"
OPTIMIZATION_VIEW = "📈 Optimization"
SCORING_VIEW = "💯 Scoring"


def build_dashboard_link(
    dataset_uri: str, view: str, instances: list[str] | None = None
) -> str:
    """Dashboard link with filters for a specific dataset and instances.

    Format parity with the reference (``thoth/util/dashboard.py:11-21``):
    base URL from ``DASHBOARD_URL`` (default the local Streamlit port),
    ``dataset_uri`` and ``view`` query params, one repeated ``instances``
    param per instance, %-encoded (not +-encoded) like yarl produces."""
    base_url = os.environ.get("DASHBOARD_URL", "http://localhost:8501")
    params: list[tuple[str, str]] = [("dataset_uri", dataset_uri), ("view", view)]
    for instance in instances or []:
        params.append(("instances", instance))
    return f"{base_url}?{urlencode(params, quote_via=quote)}"


def dashboard_page(
    repo, dataset_uri: str, view: str = PROFILING_VIEW
) -> dict[str, DataFrame]:
    """The data behind one dashboard page, keyed by section title —
    the engine-side equivalent of the reference's ``build_*_view``
    functions (``ui.py:97-293``), minus the plotting layer.

    Works with either repository adapter (parquet or JDBC): only the
    shared read API is used."""
    if view == PROFILING_VIEW:
        metrics = repo.select_profiling(dataset_uri)
        return {"profiling_series": viz.timeseries_view(metrics)}
    opt = repo.get_optimization(dataset_uri)
    scoring = repo.select_scoring(dataset_uri)
    if view == OPTIMIZATION_VIEW:
        return {"optimization": opt}
    if view == SCORING_VIEW:
        return {
            "score_band": viz.scoring_view(scoring, opt),
            "forecast_interval": viz.forecast_interval_view(scoring, opt),
        }
    raise ValueError(
        f"Unknown view {view!r}; expected one of "
        f"{[PROFILING_VIEW, OPTIMIZATION_VIEW, SCORING_VIEW]}"
    )
