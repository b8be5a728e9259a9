"""Counter feature-id bit packing (reference: common/counter/
FeatureId.java:14-120 and the delivery.internal.features protos from
the public promotedai/schema repo — not vendored in the reference
snapshot, so enum numbers below are recovered from the reference's own
golden tests, job/counter/FeatureIdTest.java:18-113).

Layout of a feature id (single long, bitwise OR of three disjoint
fields):

    bits 13+  CountType    (what is being counted, per key family)
    bits 5-12 AggMetric    (which metric — for action-derived metrics
                            the number is ActionType << 5,
                            FlatUtil.java:828-842)
    bits 1-4  CountWindow  (trailing window the count covers)
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F

WINDOW_MASK = 0x1F
AGG_METRIC_MASK = 0x1FE0
TYPE_MASK = ~0x1FFF


class CountType(IntEnum):
    # golden-verified (FeatureIdTest.java)
    ITEM_DEVICE_COUNT = 0x102000
    USER_COUNT = 0x118000
    LOG_USER_COUNT = 0x12E000
    USER_ITEM_COUNT = 0x144000
    USER_ITEM_HOURS_AGO = 0x146000
    LOG_USER_ITEM_COUNT = 0x148000
    LOG_USER_ITEM_HOURS_AGO = 0x14A000
    USER_QUERY_COUNT = 0x178000
    USER_QUERY_HOURS_AGO = 0x17A000
    LOG_USER_QUERY_COUNT = 0x17C000
    LOG_USER_QUERY_HOURS_AGO = 0x17E000
    # inferred by the enum's spacing pattern (no golden value in the
    # reference snapshot — the schema protos are external); marked so
    # tests pin only the verified ones
    QUERY_COUNT = 0x15A000
    ITEM_QUERY_COUNT = 0x170000


class CountWindow(IntEnum):
    NONE = 0
    HOUR = 2
    DAY = 4
    DAY_7 = 6
    DAY_30 = 8
    DAY_90 = 10


class AggMetric(IntEnum):
    """Action-derived metrics are ActionType << 5 (ActionType numbers
    from the public schema: NAVIGATE=2, PURCHASE=3, ADD_TO_CART=4,
    SHARE=5, LIKE=6, COMMENT=7, CHECKOUT=8, UNLIKE=9,
    REMOVE_FROM_CART=10, MAKE_OFFER=11, ANSWER_QUESTION=13,
    COMPLETE_SIGN_IN=14, COMPLETE_SIGN_UP=15)."""

    UNKNOWN_AGGREGATE = 0
    COUNT_IMPRESSION = 1 << 5
    COUNT_NAVIGATE = 2 << 5
    COUNT_PURCHASE = 3 << 5
    COUNT_ADD_TO_CART = 4 << 5
    COUNT_SHARE = 5 << 5
    COUNT_LIKE = 6 << 5
    COUNT_COMMENT = 7 << 5
    COUNT_CHECKOUT = 8 << 5
    COUNT_UNLIKE = 9 << 5
    COUNT_REMOVE_FROM_CART = 10 << 5
    COUNT_MAKE_OFFER = 11 << 5
    COUNT_ANSWER_QUESTION = 13 << 5
    COUNT_COMPLETE_SIGN_IN = 14 << 5
    COUNT_COMPLETE_SIGN_UP = 15 << 5
    SUM_PURCHASE_GMV = 255 << 5


def feature_id(
    count_type: int | None, metric: int | None, window: int | None
) -> int:
    """featureId(type, value, window) — plain bitwise OR of disjoint
    fields (FeatureId.java:84-89)."""
    return (count_type or 0) | (metric or 0) | (window or 0)


def count_type(fid: int) -> int:
    return fid & TYPE_MASK


def agg_metric(fid: int) -> int:
    return fid & AGG_METRIC_MASK


def count_window(fid: int) -> int:
    return fid & WINDOW_MASK


def get_count_window(window_size: int, window_unit: str) -> CountWindow:
    """(size, unit) → CountWindow, same legal set as
    FeatureId.getCountWindow (1 HOURS; 1/7/30/90 DAYS)."""
    if window_unit == "HOURS":
        if window_size != 1:
            raise ValueError(f"unexpected hours window: {window_size}")
        return CountWindow.HOUR
    if window_unit == "DAYS":
        try:
            return {
                1: CountWindow.DAY,
                7: CountWindow.DAY_7,
                30: CountWindow.DAY_30,
                90: CountWindow.DAY_90,
            }[window_size]
        except KeyError:
            raise ValueError(f"unexpected window size: {window_size}") from None
    raise ValueError(f"unexpected windowUnit: {window_unit}")


def expand_feature_ids(
    types: list[int], metrics: list[int], windows: list[int]
) -> set[int]:
    """Cross product of segments (FeatureId.expandFeatureIds)."""
    return {feature_id(t, m, w) for t in types for m in metrics for w in windows}


STANDARD_METRICS = (
    AggMetric.COUNT_IMPRESSION,
    AggMetric.COUNT_NAVIGATE,
    AggMetric.COUNT_ADD_TO_CART,
    AggMetric.COUNT_CHECKOUT,
    AggMetric.COUNT_PURCHASE,
    AggMetric.SUM_PURCHASE_GMV,
)


def agg_metric_for_action(action_type_col: Column) -> Column:
    """AggMetric number for an action row: ActionType << 5 (0 for
    custom/unknown) — FlatUtil.getAggMetricValue. Impressions use
    COUNT_IMPRESSION explicitly."""
    n = action_type_col.cast("long")
    return (
        F.when((n >= 2) & (n <= 15), F.shiftleft(n, 5))
        .otherwise(F.lit(int(AggMetric.UNKNOWN_AGGREGATE)))
        .cast("long")
    )


def feature_id_col(count_type_val: int, metric_col: Column, window_val: int) -> Column:
    """Column-side feature id: constant type/window OR'd with a
    per-row metric column (JVM-side bitwise ops, codegen'd)."""
    return (
        F.lit(int(count_type_val)).cast("long")
        .bitwiseOR(metric_col.cast("long"))
        .bitwiseOR(F.lit(int(window_val)).cast("long"))
    )
