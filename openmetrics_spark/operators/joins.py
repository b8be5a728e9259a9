"""Time-aware joins.

The reference's join layer is all event-time, state+timer machinery;
these are the batch (DataFrame) twins:

- ``asof_join`` — TemporalJoinFunction / UserJoin semantics: each left
  (fact) row is enriched with the latest right (dimension) row whose
  timestamp is <= the fact's (reference:
  pipeline/.../common/functions/TemporalJoinFunction.java:25-207,
  userjoin/UserJoin.java:36-358).
- ``interval_join`` — the explicit-FK portion of the inferred-reference
  join: right rows match left rows within an event-time interval
  (reference: pipeline/.../common/functions/inferred/BaseInferred.java,
  explicit-id path :304-481).
- ``nearest_join`` — the inference portion's tie-break rule: among
  candidates in the window, pick the TEMPORALLY NEAREST left row
  (reference: BaseInferred.java:605-650 binary-searched nearest match).
- ``inferred_join`` — the full scope-fallback join: try the most
  specific ancestor key first, fall back scope by scope, nearest-in-
  time within each scope (reference: BaseInferred.java:39-734 and the
  three instances ViewResponseInsertion/InsertionImpression/
  ImpressionAction ProcessFunction.java).

Scale notes: ``asof_join`` uses the union+last_value trick — ONE
shuffle+sort of |L|+|R| rows, no range-explosion, no per-key loop; this
is the standard scalable as-of on MPP engines. ``nearest_join`` joins
on equi-keys first (so Catalyst plans a hash/SMJ join, never a
nested-loop), filters to the window, then takes min_by(|Δt|) — with a
map-side partial aggregate. ``inferred_join`` runs one nearest_join
per scope on the still-unmatched remainder, which shrinks every stage.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Left-outer as-of (backward, inclusive): attach the most recent
    right row with ``right_ts <= left_ts`` per ``on`` key.

    Union both sides, sort once per key by (ts, side) with the right
    side winning ties, and carry the last non-null right payload
    forward. |L|+|R| rows through one shuffle — never a range join.
    """
    from pyspark.sql import Window

    lms = F.unix_millis(F.col(left_ts))
    rms = F.unix_millis(F.col(right_ts))
    payload = F.struct(rms.alias("__rms"), *[F.col(c) for c in right_cols])

    l_tag = left.select(
        *on,
        lms.alias("__ms"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(payload.alias("__rpay")).schema["__rpay"].dataType
        ).alias("__rpay"),
    )
    r_tag = right.select(
        *on,
        rms.alias("__ms"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
            ).schema["__lrow"].dataType
        ).alias("__lrow"),
        payload.alias("__rpay"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ms", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__ms") - F.col("__match.__rms") <= F.lit(tolerance_ms),
                F.col("__match"),
            ),
        )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in right_cols
    ]
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with
    ``left_ts + lower_ms <= right_ts <= left_ts + upper_ms`` (all in
    epoch millis), equi on ``on``. The equi keys make it a hash/SMJ
    join with the range as a residual filter — no NLJ."""
    lms = F.unix_millis(left[left_ts])
    rms = F.unix_millis(right[right_ts])
    cond = [left[c] == right[c] for c in on] + [
        rms >= lms + F.lit(lower_ms),
        rms <= lms + F.lit(upper_ms),
    ]
    joined = left.join(right, cond, how)
    return joined


@dataclass(frozen=True)
class Scope:
    """One inference scope: the equi-keys to match on, most → least
    specific, mirroring getLeftJoinIds orderings (reference:
    pipeline/.../inferred/ImpressionActionProcessFunction.java:38-56)."""

    keys: tuple[str, ...]


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_before_ms: int,
    window_after_ms: int,
    left_payload: Sequence[str],
    right_id: str,
    content_filter: tuple[str, str] | None = None,
) -> DataFrame:
    """For each right row, the single temporally-nearest left row with
    ``right_ts - window_before_ms <= left_ts <= right_ts +
    window_after_ms``, equi on ``on``. Ties (same |Δt|) break toward
    the EARLIER left row, then smallest payload — deterministic.

    ``content_filter=(left_col, right_col)``: when the right row
    carries a content id, candidates must carry the same one
    (reference: inferred/ContentId.java:66-95 — content-id narrowed
    scopes).

    Returns right_id + ``__lpick`` struct (null if no candidate).
    """
    lms = F.unix_millis(left[left_ts]).alias("__lms")
    rms = F.unix_millis(right[right_ts]).alias("__rms")
    lsel = [*on, lms, F.struct(*[left[c] for c in left_payload]).alias("__lrow")]
    rsel = [*on, rms, right[right_id].alias(right_id)]
    if content_filter is not None:
        lc, rc = content_filter
        lsel.append(left[lc].alias("__lcontent"))
        rsel.append(right[rc].alias("__rcontent"))
    # explicit side aliases: left/right usually derive from the same
    # base frame, and same-name equality on shared-lineage frames trips
    # Spark's "trivially true equals predicate" ambiguity warning
    l = left.select(*lsel).alias("__L")
    r = right.select(*rsel).alias("__R")
    cond = [F.col(f"__L.{c}") == F.col(f"__R.{c}") for c in on] + [
        F.col("__lms") >= F.col("__rms") - F.lit(window_before_ms),
        F.col("__lms") <= F.col("__rms") + F.lit(window_after_ms),
    ]
    if content_filter is not None:
        cond.append(
            F.col("__rcontent").isNull()
            | (F.col("__rcontent") == "")
            | (F.col("__lcontent") == F.col("__rcontent"))
        )
    cand = r.join(l, cond, "inner")
    dist = F.abs(F.col("__lms") - F.col("__rms"))
    pick = cand.groupBy(right_id).agg(
        F.min_by(
            "__lrow", F.struct(dist.alias("d"), F.col("__lms"), F.col("__lrow"))
        ).alias("__lpick")
    )
    return pick


def inferred_join(
    left: DataFrame,
    right: DataFrame,
    scopes: Sequence[Scope],
    fk: tuple[str, str] | None,
    left_ts: str,
    right_ts: str,
    window_before_ms: int,
    window_after_ms: int,
    left_payload: Sequence[str],
    right_id: str,
    right_outer: bool = False,
    content_filter: tuple[str, str] | None = None,
) -> DataFrame:
    """Scope-fallback nearest-in-time join (the batch oracle of the
    reference's BaseInferred state machine).

    1. If ``fk=(right_fk_col, left_pk_col)`` is given, right rows whose
       FK is set join directly on it (the "explicit id join").
    2. Remaining right rows fall through ``scopes`` in order; each
       scope is a :func:`nearest_join` on that scope's equi-keys within
       the window. A right row matched at scope i never reaches scope
       i+1.
    3. ``right_outer=True`` keeps unmatched right rows with a null
       payload (the view→insertion instance); else they are dropped
       (inner, like insertion→impression and impression→action).

    Returns: right columns + ``__lpick`` struct of ``left_payload``.
    """
    # Truncate lineage once per join: the scope-fallback chain
    # references `left` and `right` several times each, and in a
    # multi-stage pipeline each stage's left is the whole upstream
    # plan — without a cut the analyzer's tree grows exponentially.
    # (The reference bounds the same blow-up by splitting jobs at
    # Kafka topics; localCheckpoint is the in-process analog.)
    left = left.localCheckpoint(eager=False)
    right = right.withColumn("__rid", F.col(right_id)).localCheckpoint(eager=False)
    remaining = right
    picks: list[DataFrame] = []

    if fk is not None:
        rfk, lpk = fk
        with_fk = remaining.filter(F.col(rfk).isNotNull())
        remaining = remaining.filter(F.col(rfk).isNull())
        l = left.select(
            F.col(lpk).alias("__lpk"),
            F.struct(*[F.col(c) for c in left_payload]).alias("__lrow"),
            F.unix_millis(F.col(left_ts)).alias("__lms"),
        )
        r = with_fk.select("__rid", F.col(rfk).alias("__rfk"))
        m = (
            r.join(l, F.col("__rfk") == F.col("__lpk"), "inner")
            .groupBy("__rid")
            .agg(
                F.min_by("__lrow", F.struct("__lms", "__lrow")).alias("__lpick")
            )
        )
        picks.append(m)
        matched_ids = m.select(F.col("__rid").alias("__mrid"))
        remaining = remaining.unionByName(
            with_fk.join(
                matched_ids, with_fk["__rid"] == matched_ids["__mrid"], "left_anti"
            )
        )

    string_cols = {f.name for f in right.schema.fields if f.dataType.simpleString() == "string"}
    for scope in scopes:
        cand_right = remaining
        for k in scope.keys:
            cand_right = cand_right.filter(F.col(k).isNotNull())
            if k in string_cols:
                cand_right = cand_right.filter(F.col(k) != "")
        m = nearest_join(
            left,
            cand_right,
            scope.keys,
            left_ts,
            right_ts,
            window_before_ms,
            window_after_ms,
            left_payload,
            "__rid",
            content_filter=content_filter,
        )
        picks.append(m)
        remaining = remaining.join(
            m.select("__rid"), on="__rid", how="left_anti"
        )

    all_picks = picks[0]
    for p in picks[1:]:
        all_picks = all_picks.unionByName(p)

    how = "left" if right_outer else "inner"
    return right.join(all_picks, on="__rid", how=how).drop("__rid")


def fifo_dedupe(
    left: DataFrame,
    pk: str,
    order_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """FIFO dedupe by primary join key — the DUPLICATE_EVENTS_TAG side
    channel (reference: inferred/BaseInferred.java:336-343: the first
    LHS row stored under a primary key wins; any later LHS row with the
    same key goes to the duplicate side output and never joins).

    Batch twin: rank rows per ``pk`` by ``order_cols`` (event time
    first, plus a deterministic tiebreak) and split rank 1 / rank >1.
    One shuffle on ``pk``; the window is a map-side rank within each
    hash partition, so this scales like any groupBy on the same key.

    Returns ``(kept, duplicates)`` with the input columns unchanged.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(pk).orderBy(*[F.col(c) for c in order_cols])
    ranked = left.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") == 1).drop("__rn")
    dups = ranked.filter(F.col("__rn") > 1).drop("__rn")
    return kept, dups


def field_mismatches(
    joined: DataFrame,
    record_id: str,
    ts_col: str,
    fields: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """MismatchErrorTag side channel (reference:
    common/util/JoinValueSetter.java:40-100 via
    common/error/MismatchErrorTag.java): while filling a joined row,
    a field whose LHS value is already non-empty is NEVER overwritten —
    if the RHS carries a different non-empty value, a MismatchError
    record {field, lhs value, rhs value, record id, log timestamp} is
    emitted to the side output instead.

    ``fields`` is ``(field_name, lhs_col, rhs_col)``; one output row
    per joined row per disagreeing field. Implemented as an
    explode over a per-row literal array of field structs — a narrow
    projection, no shuffle, no UDF.

    Returns columns: ``record_id, field, lhs_value, rhs_value, ms``.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("field"),
                F.col(lhs).cast("string").alias("lhs_value"),
                F.col(rhs).cast("string").alias("rhs_value"),
            )
            for name, lhs, rhs in fields
        ]
    )
    nonempty = lambda c: c.isNotNull() & (c != "")  # noqa: E731
    return (
        joined.select(
            F.col(record_id).alias("record_id"),
            F.col(ts_col).alias("ms"),
            F.explode(pairs).alias("p"),
        )
        .filter(
            nonempty(F.col("p.lhs_value"))
            & nonempty(F.col("p.rhs_value"))
            & (F.col("p.lhs_value") != F.col("p.rhs_value"))
        )
        .select(
            "record_id",
            F.col("p.field").alias("field"),
            F.col("p.lhs_value").alias("lhs_value"),
            F.col("p.rhs_value").alias("rhs_value"),
            "ms",
        )
    )


USER_MERGE_RULES = {
    # field-wise REPLACE, not proto mergeFrom (UserUpdateMerger.java:
    # 37-110): a later update's non-empty user id wins; "once an
    # internal user, always an internal user"; ignore_usage takes the
    # latest update's value; properties replace wholesale.
    "user_id": "last_non_empty",
    "is_internal_user": "sticky_true",
    "ignore_usage": "latest",
    "properties_json": "latest_non_null",
}


def effective_users(
    users: DataFrame,
    on: Sequence[str] = ("platform_id", "log_user_id"),
    ts_col: str = "log_timestamp",
    order_col: str | None = None,
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """Versioned "effective user" per key: each update row becomes the
    fold of every update at or before it (reference:
    userjoin/UserUpdateMerger.java:19-110 advanceTo — the reference
    folds the sorted update list imperatively; one pass of running
    window aggregates is the same fold, map-side sorted within each
    key partition). ``order_col`` breaks same-timestamp update ties
    (defaults to the first rule column)."""
    from pyspark.sql import Window

    rules = USER_MERGE_RULES if rules is None else rules
    present = [c for c in rules if c in users.columns]
    order = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col is not None else []
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = users
    for c in present:
        rule = rules[c]
        if rule == "last_non_empty":
            src = F.when(F.col(c).isNotNull() & (F.col(c) != ""), F.col(c))
            expr = F.last(src, ignorenulls=True).over(w)
        elif rule == "sticky_true":
            expr = F.max(F.coalesce(F.col(c), F.lit(False)).cast("int")).over(w) == 1
        elif rule == "latest":
            expr = F.last(F.col(c), ignorenulls=False).over(w)
        else:  # latest_non_null
            expr = F.last(F.col(c), ignorenulls=True).over(w)
        out = out.withColumn(c, expr)
    return out


def user_join(
    events: DataFrame,
    users: DataFrame,
    on: Sequence[str] = ("platform_id", "log_user_id"),
    event_ts: str = "ts",
    user_ts_ms: str = "log_timestamp",
    user_cols: Sequence[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """UserJoin (reference: userjoin/UserJoin.java:36-358): attach the
    effective (version-merged) user at each event's timestamp. Batch
    form: fold the updates into versions (``effective_users``), then
    one as-of join — |events| + |updates| rows through one shuffle.
    Same-timestamp versions collapse to the last fold so the as-of
    pick is deterministic.

    ``event_ts`` is a TimestampType column; ``user_ts_ms`` is the
    update stream's epoch-millis long (the flat USER schema's
    log_timestamp)."""
    from pyspark.sql import Window

    eff = effective_users(users, on, ts_col=user_ts_ms, order_col=order_col)
    cols = [c for c in (user_cols or USER_MERGE_RULES) if c in eff.columns]
    # one version per (key, ts): the final fold at that instant —
    # order_col is the only live tiebreak (ts is a partition constant;
    # without one, fall back to ALL merged fields desc — a total order
    # over the output columns, so two versions that still tie are
    # identical in everything the join emits and the pick can't leak
    # nondeterminism downstream)
    if order_col is not None:
        worder = [F.col(order_col).desc()]
    elif cols:
        worder = [F.col(c).desc() for c in cols]
    else:
        worder = [F.lit(1)]
    wv = Window.partitionBy(*on, user_ts_ms).orderBy(*worder)
    eff = (
        eff.withColumn("__vn", F.row_number().over(wv))
        .filter(F.col("__vn") == 1)
        .drop("__vn")
        .select(
            *on,
            F.timestamp_millis(F.col(user_ts_ms)).alias("__user_ts"),
            *cols,
        )
    )
    return asof_join(
        events,
        eff,
        on=on,
        left_ts=event_ts,
        right_ts="__user_ts",
        right_cols=cols,
    )
