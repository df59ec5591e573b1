"""Runnable dashboard server: the reference's Streamlit app surface
(``/root/reference/ui.py:311-397`` — a home page with a dataset selector
feeding the profiling / optimization / scoring views, plus an About
page) served from the Python standard library (``http.server``), so the
engine's monitoring UI runs with zero extra dependencies.

Pages:

- ``/``            — dataset index (one link per registered dataset)
- ``/dataset?uri=``— the three-view dashboard for one dataset
  (:func:`thoth_spark.dashboard_html.render_dashboard_html` — inline-SVG
  charts of the same data views the reference plots)
- ``/about``       — engine/about text (reference ``about_page``)
- ``/curation``    — the curation-funnel view (docs in → Gopher pass →
  cap/mix survivors → split sizes), rendered from the audit dict the
  showcase pipeline returns (net-new vs the reference: its UI has no
  curation surface); 404 unless ``curation_stats`` was passed

The server is presentation-boundary only: every request renders from
bounded repository reads (``max_points`` newest points per metric); the
underlying metric frames stay lazy/distributed for programmatic
consumers. Serving is a daemon thread — suitable for notebooks and
operator laptops, not for multi-tenant production (put a real WSGI
front on :func:`render_dashboard_html` for that).
"""

from __future__ import annotations

import html
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from thoth_spark.dashboard_html import (
    _parse_date,
    render_curation_html,
    render_dashboard_html,
)

_ABOUT = (
    "<!doctype html><html><head><meta charset='utf-8'>"
    "<title>thoth_spark — about</title></head><body>"
    "<h1>About</h1><p>thoth_spark: a PySpark-native profiling / anomaly "
    "/ curation engine. This dashboard mirrors the reference UI's pages "
    "(home with per-dataset profiling, optimization and scoring views; "
    "about) as dependency-free server-rendered HTML.</p>"
    "<p><a href='/'>&#127968; Home</a></p></body></html>"
)


def _home_html(repo, has_curation: bool = False) -> str:
    rows = repo.get_datasets()
    items = "".join(
        "<li><a href='/dataset?uri={q}'>{t}</a></li>".format(
            q=html.escape(d["dataset_uri"], quote=True),
            t=html.escape(d["dataset_uri"]),
        )
        for d in rows
    )
    body = (
        f"<ul>{items}</ul>"
        if items
        else "<p>No datasets registered yet — run profile_create first.</p>"
    )
    curation_link = (
        "<p><a href='/curation'>&#128202; Curation funnel</a></p>"
        if has_curation
        else ""
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>thoth_spark dashboard</title></head><body>"
        "<h1>&#127968; thoth_spark dashboard</h1>"
        f"{body}{curation_link}"
        "<p><a href='/about'>&#10067; About</a></p></body></html>"
    )


class DashboardServer:
    """A started dashboard HTTP server bound to ``host:port`` (port 0
    picks a free one). Use as a context manager or call :meth:`stop`."""

    def __init__(
        self,
        repo,
        host: str = "127.0.0.1",
        port: int = 0,
        max_points: int = 1000,
        curation_stats: dict | None = None,
    ):
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # silence stderr access log
                pass

            def _send(self, code: int, content: str):
                data = content.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 (http.server API name)
                url = urlparse(self.path)
                try:
                    if url.path == "/":
                        self._send(
                            200,
                            _home_html(
                                outer.repo,
                                has_curation=outer.curation_stats is not None,
                            ),
                        )
                    elif url.path == "/about":
                        self._send(200, _ABOUT)
                    elif url.path == "/curation":
                        # the curation-funnel view (r14): docs in →
                        # Gopher pass → cap/mix survivors → split
                        # sizes, fed from the showcase's audit dict
                        if outer.curation_stats is None:
                            self._send(
                                404,
                                "<h1>404</h1><p>no curation stats "
                                "configured — pass curation_stats= to "
                                "serve_dashboard</p>",
                            )
                        else:
                            self._send(
                                200,
                                render_curation_html(outer.curation_stats),
                            )
                    elif url.path == "/dataset":
                        qs = parse_qs(url.query)
                        uris = qs.get("uri", [])

                        def _opt(key: str) -> str | None:
                            vals = qs.get(key, [])
                            return vals[0] if vals and vals[0] else None

                        # validate hand-editable date params up front:
                        # a malformed ?start=/&end= is a caller error
                        # (400), not a server failure — previously the
                        # ValueError fell through to the generic 500
                        # handler (r9 verdict #6)
                        bad_date = None
                        for key in ("start", "end"):
                            try:
                                _parse_date(_opt(key))
                            except ValueError:
                                bad_date = key
                        if bad_date is not None:
                            self._send(
                                400,
                                "<h1>400</h1><p>malformed ISO date in "
                                f"?{html.escape(bad_date)}=</p>",
                            )
                        elif not uris:
                            self._send(400, "<h1>400</h1><p>missing ?uri=</p>")
                        elif outer.repo.get_dataset(uris[0]) is None:
                            self._send(
                                404,
                                "<h1>404</h1><p>unknown dataset "
                                f"{html.escape(uris[0])}</p>",
                            )
                        else:
                            # selector-driven re-render (reference
                            # ui.py:97-293): instance/metric/date-range
                            # query params narrow every view; the date
                            # range reaches the repository scan
                            self._send(
                                200,
                                render_dashboard_html(
                                    outer.repo,
                                    uris[0],
                                    outer.max_points,
                                    instance=_opt("instance"),
                                    metric=_opt("metric"),
                                    start=_opt("start"),
                                    end=_opt("end"),
                                ),
                            )
                    else:
                        self._send(404, "<h1>404</h1>")
                except Exception as exc:  # render errors become a 500 page
                    self._send(
                        500, f"<h1>500</h1><pre>{html.escape(str(exc))}</pre>"
                    )

        self.repo = repo
        self.max_points = max_points
        self.curation_stats = curation_stats
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "DashboardServer":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


def serve_dashboard(
    repo,
    host: str = "127.0.0.1",
    port: int = 0,
    max_points: int = 1000,
    curation_stats: dict | None = None,
) -> DashboardServer:
    """Start the dashboard server in a daemon thread and return it (read
    ``.url`` for the address; ``.stop()`` when done)."""
    return DashboardServer(
        repo,
        host=host,
        port=port,
        max_points=max_points,
        curation_stats=curation_stats,
    )
