"""Quality assessment: compare anomaly scores against optimized thresholds
and notify handlers (flow C — ``/root/reference/thoth/quality.py:84-113``)."""

from __future__ import annotations

import abc
import dataclasses
import datetime
import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("thoth_spark.quality")


@dataclasses.dataclass
class AnomalousScore:
    """One metric whose score exceeded its optimized threshold."""

    metric: tuple[str, ...]
    score: float
    threshold: float


class NotificationHandler(abc.ABC):
    """Warning hook fired when a batch assessment finds anomalies.

    ``notify`` builds the scoring-view dashboard deep-link (filtered to
    the anomalous instances) and hands it to the subclass ``_notify`` —
    the reference's handler contract (``thoth/quality.py:39-62``)."""

    @abc.abstractmethod
    def _notify(
        self,
        dataset_uri: str,
        ts: datetime.datetime | None,
        anomalous_scores: list[AnomalousScore],
        dashboard_link: str | None = None,
    ) -> None: ...

    def notify(
        self,
        dataset_uri: str,
        ts: datetime.datetime | None,
        anomalous_scores: list[AnomalousScore],
    ) -> None:
        from thoth_spark.dashboard import SCORING_VIEW, build_dashboard_link

        # metric tuple layout is (dataset_uri?, entity, instance, name) —
        # instance is always second-from-last
        instances = sorted({a.metric[-2] for a in anomalous_scores if len(a.metric) >= 2})
        self._notify(
            dataset_uri,
            ts,
            anomalous_scores,
            dashboard_link=build_dashboard_link(
                dataset_uri=dataset_uri, view=SCORING_VIEW, instances=instances
            ),
        )


class LogHandler(NotificationHandler):
    """Logs anomalies as errors (the reference's default handler),
    including the dashboard deep-link (``thoth/quality.py:64-81``)."""

    def _notify(self, dataset_uri, ts, anomalous_scores, dashboard_link=None):
        logger.error(
            "Anomaly detected for ts=%s on dataset_uri=%s! Metrics above "
            "their optimized threshold: %s. Please check the dataset "
            "dashboard for more information: %s",
            ts,
            dataset_uri,
            anomalous_scores,
            dashboard_link,
        )


def anomalies(
    scoring_df: DataFrame, optimization_df: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Scores joined to thresholds, filtered to ``score > threshold``.

    The threshold side is one row per metric — always broadcast."""
    thresholds = optimization_df.select(*key_cols, "threshold")
    return (
        scoring_df.join(F.broadcast(thresholds), on=key_cols)
        .where(F.col("error") > F.col("threshold"))
        .select(*key_cols, "ts", F.col("error").alias("score"), "threshold")
    )


def assess_quality(
    optimization_df: DataFrame,
    scoring_df: DataFrame,
    key_cols: list[str] | None = None,
    notification_handlers: Sequence[NotificationHandler] | None = None,
    dataset_uri: str = "",
) -> bool:
    """True when every metric scored within its threshold; otherwise
    notifies the handlers with the anomalous metrics and returns False."""
    key_cols = key_cols or [
        c for c in ("dataset_uri", "entity", "instance", "name") if c in scoring_df.columns
    ]
    rows = anomalies(scoring_df, optimization_df, key_cols).collect()
    if not rows:
        logger.info("Quality assessment finished, everything good.")
        return True
    scores = [
        AnomalousScore(
            metric=tuple(r[c] for c in key_cols), score=r["score"], threshold=r["threshold"]
        )
        for r in rows
    ]
    ts = rows[0]["ts"]
    for handler in notification_handlers or [LogHandler()]:
        handler.notify(dataset_uri=dataset_uri, ts=ts, anomalous_scores=scores)
    return False
