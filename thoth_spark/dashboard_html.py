"""Runnable dashboard: self-contained HTML export of the three reference
dashboard views (``/root/reference/ui.py:97-293`` — profiling series,
scoring band, forecast interval) rendered as inline SVG. No plotting
dependency, no server: the output opens in any browser, so the engine's
monitoring surface is usable without the reference's Streamlit stack.

The data comes from the same :mod:`thoth_spark.viz` views the reference
plots; collection happens HERE, at the presentation boundary, and is
bounded: a dashboard page renders at most ``max_points`` points per
metric (the newest ones), exactly like any BI tool's query limit — the
underlying views stay lazy/distributed for programmatic consumers.
"""

from __future__ import annotations

import datetime
import html

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from thoth_spark import viz

_KEY = ["entity", "instance", "name"]

_W, _H, _PAD = 640, 180, 42


def _fmt(v: float) -> str:
    return f"{v:.4g}"


def _scale(points, width=_W, height=_H, pad=_PAD):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points if p[1] is not None]
    if not ys:
        return None
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    if x1 == x0:
        x1 = x0 + 1
    if y1 == y0:
        y1 = y0 + 1

    def sx(x):
        return pad + (x - x0) / (x1 - x0) * (width - 2 * pad)

    def sy(y):
        return height - pad / 2 - (y - y0) / (y1 - y0) * (height - 1.5 * pad)

    return sx, sy, (x0, x1, y0, y1)


def _polyline(points, sx, sy, color, dash=""):
    pts = " ".join(
        f"{sx(x):.1f},{sy(y):.1f}" for x, y in points if y is not None
    )
    dash_attr = f' stroke-dasharray="{dash}"' if dash else ""
    return (
        f'<polyline fill="none" stroke="{color}" stroke-width="1.5"'
        f'{dash_attr} points="{pts}"/>'
    )


def _chart(title: str, series: list[tuple[str, str, str, list]], markers=None) -> str:
    """One SVG chart. ``series`` = [(label, color, dash, [(x, y)...])];
    ``markers`` = [(x, y, color)] highlighted points."""
    all_pts = [p for _, _, _, pts in series for p in pts]
    scaled = _scale(all_pts)
    if scaled is None:
        return f"<h3>{html.escape(title)}</h3><p>(no data)</p>"
    sx, sy, (x0, x1, y0, y1) = scaled
    parts = [
        f'<svg viewBox="0 0 {_W} {_H}" width="{_W}" height="{_H}" '
        f'style="background:#fff;border:1px solid #ddd">',
        f'<text x="{_PAD}" y="14" font-size="12" font-weight="bold">'
        f"{html.escape(title)}</text>",
    ]
    legend_x = _PAD
    for label, color, dash, pts in series:
        parts.append(_polyline(pts, sx, sy, color, dash))
        parts.append(
            f'<text x="{legend_x}" y="28" font-size="10" fill="{color}">'
            f"{html.escape(label)}</text>"
        )
        legend_x += 9 * len(label) + 18
    for x, y, color in markers or []:
        if y is not None:
            parts.append(
                f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="3.5" '
                f'fill="{color}"/>'
            )
    parts.append(
        f'<text x="2" y="{_H - _PAD / 2:.0f}" font-size="9">{_fmt(y0)}</text>'
        f'<text x="2" y="{_PAD / 2 + 8:.0f}" font-size="9">{_fmt(y1)}</text>'
    )
    lo = datetime.datetime.fromtimestamp(x0, datetime.timezone.utc)
    hi = datetime.datetime.fromtimestamp(x1, datetime.timezone.utc)
    parts.append(
        f'<text x="{_PAD}" y="{_H - 4}" font-size="9">{lo:%Y-%m-%d}</text>'
        f'<text x="{_W - _PAD - 52}" y="{_H - 4}" font-size="9">{hi:%Y-%m-%d}</text>'
    )
    parts.append("</svg>")
    return "".join(parts)


def _tail_per_metric(df: DataFrame, max_points: int) -> DataFrame:
    w = W.partitionBy(*_KEY).orderBy(F.col("ts").desc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= max_points)
        .drop("__rn__")
    )


def _collect_by_metric(df: DataFrame, max_points: int):
    rows = _tail_per_metric(df, max_points).orderBy(*_KEY, "ts").collect()
    by_metric: dict[tuple, list] = {}
    for r in rows:
        by_metric.setdefault((r["entity"], r["instance"], r["name"]), []).append(r)
    return by_metric


def _epoch(ts) -> float:
    if isinstance(ts, datetime.datetime):
        return ts.replace(tzinfo=datetime.timezone.utc).timestamp()
    return datetime.datetime.combine(
        ts, datetime.time(), tzinfo=datetime.timezone.utc
    ).timestamp()


def _metric_filter(df: DataFrame, instance: str | None, metric: str | None) -> DataFrame:
    if instance:
        df = df.where(F.col("instance") == instance)
    if metric:
        df = df.where(F.col("name") == metric)
    return df


def _selector_form(
    dataset_uri: str,
    options: list[tuple[str, str]],
    instance: str | None,
    metric: str | None,
    start: str | None,
    end: str | None,
) -> str:
    """Server-rendered selector (reference ``ui.py:97-293``: Streamlit
    select boxes re-running the views) — a GET form whose submit
    re-renders the same page with the chosen instance/metric/date range;
    every value round-trips through query params, no JS."""

    def _opts(values: list[str], chosen: str | None) -> str:
        out = ["<option value=''>(all)</option>"]
        for v in values:
            sel = " selected" if v == chosen else ""
            e = html.escape(v, quote=True)
            out.append(f"<option value='{e}'{sel}>{e}</option>")
        return "".join(out)

    instances = sorted({i for i, _ in options})
    metrics = sorted({m for _, m in options})
    return (
        "<form method='get' action='/dataset' "
        "style='margin:12px 0;padding:8px;border:1px solid #ddd'>"
        f"<input type='hidden' name='uri' value='{html.escape(dataset_uri, quote=True)}'/>"
        f"<label>instance <select name='instance'>{_opts(instances, instance)}"
        "</select></label> "
        f"<label>metric <select name='metric'>{_opts(metrics, metric)}"
        "</select></label> "
        f"<label>from <input type='date' name='start' "
        f"value='{html.escape(start or '', quote=True)}'/></label> "
        f"<label>to <input type='date' name='end' "
        f"value='{html.escape(end or '', quote=True)}'/></label> "
        "<button type='submit'>Apply</button></form>"
    )


def _parse_date(s: str | None):
    """Parse a selector date param; raises ValueError on malformed input
    (the HTTP layer maps that to a 400, never a 500)."""
    if not s:
        return None
    return datetime.datetime.fromisoformat(s)


def _parse_end_date(s: str | None):
    """The selector's "to" input is a DATE; the user means the whole end
    day inclusive. A bare date parses to midnight, and the repository
    scans are closed intervals (``ts <= end_ts``), so passing it through
    unchanged kept only the end day's 00:00 row at sub-daily
    granularities (r9 verdict #5). Map a date-only "to" onto the last
    representable instant of that day — equivalent to ``ts < end+1day``
    at Spark's microsecond timestamp precision — while an explicit
    datetime (API callers) stays an exact closed bound."""
    parsed = _parse_date(s)
    if parsed is None:
        return None
    if len(s.strip()) == 10:  # date-only form from the selector
        return (
            parsed
            + datetime.timedelta(days=1)
            - datetime.timedelta(microseconds=1)
        )
    return parsed


def render_dashboard_html(
    repo,
    dataset_uri: str,
    max_points: int = 1000,
    instance: str | None = None,
    metric: str | None = None,
    start: str | None = None,
    end: str | None = None,
) -> str:
    """The full three-view dashboard page for one dataset as a single
    HTML string; ``instance`` / ``metric`` / ``start`` / ``end`` narrow
    every view (the reference's selector-driven re-render,
    ``/root/reference/ui.py:97-293``). Range selection happens in the
    REPOSITORY scan (``select_profiling``/``select_scoring`` closed
    intervals), so the narrowed page never reads rows outside the
    window. Works with either repository adapter (parquet or JDBC)."""
    start_ts, end_ts = _parse_date(start), _parse_end_date(end)
    sections: list[str] = [
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>thoth_spark — {html.escape(dataset_uri)}</title>"
        "<style>body{font-family:sans-serif;margin:24px}"
        "h2{border-bottom:1px solid #ccc;padding-bottom:4px}</style></head><body>",
        f"<h1>thoth_spark dashboard — {html.escape(dataset_uri)}</h1>",
    ]

    all_metrics = repo.select_profiling(dataset_uri, start_ts, end_ts)
    # selector options from the UNFILTERED frame (so narrowing one
    # selector never hides the others' choices); distinct (instance,
    # name) is aggregate-sized
    options = [
        (r["instance"], r["name"])
        for r in all_metrics.select("instance", "name").distinct().collect()
    ]
    sections.append(
        _selector_form(dataset_uri, options, instance, metric, start, end)
    )
    metrics = _metric_filter(all_metrics, instance, metric)
    sections.append("<h2>&#128100; Profiling</h2>")
    for key, rows in _collect_by_metric(
        viz.timeseries_view(metrics), max_points
    ).items():
        pts = [(_epoch(r["ts"]), r["value"]) for r in rows]
        sections.append(
            _chart(" / ".join(key), [("value", "#1f77b4", "", pts)])
        )

    try:
        opt = repo.get_optimization(dataset_uri)
        scoring = repo.select_scoring(dataset_uri, start_ts, end_ts)
    except Exception:
        sections.append("</body></html>")
        return "".join(sections)

    opt = _metric_filter(opt, instance, metric)
    scoring = _metric_filter(scoring, instance, metric)
    sections.append("<h2>&#128200; Optimization &amp; &#128175; Scoring</h2>")
    band = viz.scoring_view(scoring, opt)
    for key, rows in _collect_by_metric(band, max_points).items():
        pts_score = [(_epoch(r["ts"]), r["score"]) for r in rows]
        pts_thr = [(_epoch(r["ts"]), r["threshold"]) for r in rows]
        anomalous = [
            (_epoch(r["ts"]), r["score"], "#d62728")
            for r in rows
            if r["is_anomalous"]
        ]
        sections.append(
            _chart(
                " / ".join(key) + " — score vs threshold",
                [
                    ("score", "#1f77b4", "", pts_score),
                    ("threshold", "#d62728", "4 3", pts_thr),
                ],
                markers=anomalous,
            )
        )

    interval = viz.forecast_interval_view(scoring, opt)
    for key, rows in _collect_by_metric(interval, max_points).items():
        sections.append(
            _chart(
                " / ".join(key) + " — observed vs expected band",
                [
                    (
                        "observed",
                        "#1f77b4",
                        "",
                        [(_epoch(r["ts"]), r["observed"]) for r in rows],
                    ),
                    (
                        "expected_min",
                        "#2ca02c",
                        "4 3",
                        [(_epoch(r["ts"]), r["expected_min"]) for r in rows],
                    ),
                    (
                        "expected_max",
                        "#2ca02c",
                        "4 3",
                        [(_epoch(r["ts"]), r["expected_max"]) for r in rows],
                    ),
                ],
            )
        )

    sections.append("</body></html>")
    return "".join(sections)


def export_dashboard_html(repo, dataset_uri: str, path: str, max_points: int = 1000) -> str:
    """Write :func:`render_dashboard_html` to ``path``; returns the path."""
    content = render_dashboard_html(repo, dataset_uri, max_points)
    with open(path, "w", encoding="utf-8") as f:
        f.write(content)
    return path


#: display order + labels for the curation-funnel view; keys are the
#: stage-count keys of examples/curation_pipeline.run()'s audit dict.
_CURATION_STAGES = [
    ("corpus", "documents in"),
    ("gopher_gated", "Gopher rules + repetition pass"),
    ("c4_gated", "C4 line/page gate (audit branch)"),
    ("c4_span_deduped", "C4 span dedup + surviving-sentence floor (audit branch)"),
    ("domain_capped", "per-source frequency cap"),
    ("quality_kept", "NB quality filter"),
    ("decontaminated", "Bloom decontamination"),
    ("fuzzy_decontaminated", "fuzzy n-gram decontamination"),
    ("passage_cleaned", "passage dedup"),
    ("near_dup_unique", "MinHash near-dup survivors"),
    ("dsir_selected", "DSIR selection"),
]


def render_curation_html(stats: dict) -> str:
    """The curation-funnel view: docs in → Gopher pass → cap/mix
    survivors → split sizes, as one HTML page of proportional bars fed
    from the showcase's audit dict (``examples/curation_pipeline.run()``
    return value — plain ints, so the page renders from the pipeline's
    own bookkeeping without rescanning any corpus). Unknown stage keys
    are skipped, so the funnel degrades gracefully when a caller feeds
    a partial pipeline's stats."""
    stages = [
        (label, int(stats[key]))
        for key, label in _CURATION_STAGES
        if key in stats and stats[key] is not None
    ]
    total = max((n for _, n in stages), default=0)
    rows = []
    for label, n in stages:
        w = 0 if total == 0 else max(1, round(600 * n / total))
        rows.append(
            "<tr><td style='text-align:right;padding-right:8px'>"
            f"{html.escape(label)}</td>"
            f"<td><div style='background:#1f77b4;height:18px;width:{w}px;"
            "display:inline-block;vertical-align:middle'></div>"
            f" <b>{n}</b></td></tr>"
        )
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>thoth_spark — curation funnel</title>"
        "<style>body{font-family:sans-serif;margin:24px}"
        "h2{border-bottom:1px solid #ccc;padding-bottom:4px}</style></head><body>",
        "<h1>thoth_spark — curation funnel</h1>",
        "<h2>stage survivors</h2>",
        "<table>", *rows, "</table>",
    ]
    split = [
        (k, stats.get(f"split_{k}"))
        for k in ("train", "val", "test")
        if stats.get(f"split_{k}") is not None
    ]
    if split:
        parts.append("<h2>leakage-safe split</h2><table>")
        for k, n in split:
            parts.append(
                f"<tr><td style='padding-right:8px'>{k}</td>"
                f"<td><b>{int(n)}</b> docs</td></tr>"
            )
        parts.append("</table>")
    batches = stats.get("streaming_batches") or []
    if batches:
        # the live-feed section (r15): per-micro-batch waterfall from
        # streaming.curation_gate_foreach_batch's on_counts dicts —
        # the SAME gates as the batch showcase, observable per trigger
        parts.append(
            "<h2>live feed (per micro-batch)</h2>"
            "<table><tr><th style='padding-right:12px'>batch</th>"
            "<th style='padding-right:12px'>docs in</th>"
            "<th style='padding-right:12px'>Gopher pass</th>"
            "<th style='padding-right:12px'>repetition pass</th>"
            "<th>pass rate</th></tr>"
        )
        t_in = t_gop = t_rep = 0
        for b in batches:
            n_in = int(b["docs_in"])
            n_gop = int(b["gopher_pass"])
            n_rep = int(b["repetition_pass"])
            t_in += n_in
            t_gop += n_gop
            t_rep += n_rep
            rate = 0.0 if n_in == 0 else n_rep / n_in
            parts.append(
                f"<tr><td>#{int(b['batch_id'])}</td>"
                f"<td><b>{n_in}</b></td><td><b>{n_gop}</b></td>"
                f"<td><b>{n_rep}</b></td><td>{rate:.0%}</td></tr>"
            )
        t_rate = 0.0 if t_in == 0 else t_rep / t_in
        parts.append(
            f"<tr><td><i>total</i></td><td><b>{t_in}</b></td>"
            f"<td><b>{t_gop}</b></td><td><b>{t_rep}</b></td>"
            f"<td>{t_rate:.0%}</td></tr></table>"
        )
    extras = []
    if stats.get("c4_spans_removed") is not None:
        extras.append(
            f"<li>C4 span dedup removed <b>{int(stats['c4_spans_removed'])}"
            "</b> duplicated sentences (audit branch)</li>"
        )
    if stats.get("vocab_90") is not None:
        extras.append(
            f"<li>{int(stats['vocab_90'])} tokens cover 90% of the "
            "training split</li>"
        )
    if "bench_leaked" in stats:
        extras.append(
            f"<li>benchmark docs leaked into train: "
            f"<b>{int(stats['bench_leaked'])}</b></li>"
        )
    if extras:
        parts.append("<h2>audit</h2><ul>" + "".join(extras) + "</ul>")
    parts.append("</body></html>")
    return "".join(parts)
