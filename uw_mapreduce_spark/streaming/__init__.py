from .anomaly import rolling_zscore_stream
from .drift import cusum_drift_alerts
from .joins import (
    click_purchase_funnel,
    click_purchase_funnel_full,
    click_purchase_funnel_outer,
    view_click_purchase_funnel,
    view_click_purchase_funnel_outer,
)
from .maintenance import RollupMaintainer, maintain_rollup
from .sliding import sliding_event_time_sum, stream_events, windowed_distinct_users
from .smooth import ewma_stream

__all__ = [
    "RollupMaintainer",
    "cusum_drift_alerts",
    "ewma_stream",
    "click_purchase_funnel",
    "click_purchase_funnel_full",
    "click_purchase_funnel_outer",
    "rolling_zscore_stream",
    "maintain_rollup",
    "sliding_event_time_sum",
    "stream_events",
    "view_click_purchase_funnel",
    "view_click_purchase_funnel_outer",
    "windowed_distinct_users",
]
