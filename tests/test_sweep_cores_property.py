"""Independent-spec property tests for the extracted stateful decision
cores (`_combine_sweep`, `_cumulate_sweep`). The streaming parity tests
pin each core against its BATCH twin on replayed traffic; these pin the
cores against independently-written specs on random inputs — different
formulation (sort-then-scan vs min-loop; flat recomputation vs
incremental dict mutation), so a shared blind spot is unlikely."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from openmetrics_spark.streaming.stateful import _combine_sweep, _cumulate_sweep

KEY = ("p", "u", "cri")


def _combine_spec(rows, wm, window_ms):
    """Greedy window partition over the SORTED rows: the earliest
    unconsumed row opens a window; everything within window_ms joins;
    a window emits iff the watermark passed its end. Winner: API over
    SDK, then earliest, then request_id."""
    remaining = sorted(rows, key=lambda r: (r[0], not r[1], r[2]))
    out = []
    open_rows = []
    while remaining:
        w_start = remaining[0][0]
        w_end = w_start + window_ms
        grp = [r for r in remaining if r[0] <= w_end]
        remaining = [r for r in remaining if r[0] > w_end]
        if wm >= w_end:
            best = min(grp, key=lambda r: (not r[1], r[0], r[2]))
            out.append((*KEY, best[2], best[1], best[0]))
        else:
            open_rows.extend(grp)
            open_rows.extend(remaining)
            remaining = []
    return out, open_rows


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.booleans(),
            st.text(alphabet="rs", min_size=1, max_size=3),
        ),
        max_size=20,
    ),
    wm=st.integers(min_value=-5, max_value=70),
    window_ms=st.integers(min_value=1, max_value=12),
)
def test_combine_sweep_matches_spec(rows, wm, window_ms):
    rows_l = [list(r) for r in rows]
    got_out, got_rows = _combine_sweep(rows_l, wm, window_ms, KEY)
    want_out, want_rows = _combine_spec(rows, wm, window_ms)
    assert sorted(got_out) == sorted(want_out)
    # open (unemitted) rows survive as state, order irrelevant
    assert sorted(map(tuple, got_rows)) == sorted(map(tuple, want_rows))


def _cumulate_spec(periods, wm, step_ms, period_ms, key0):
    """Flat recomputation: for every period, the finalized buckets are
    those with bucket_end <= wm; each emits (period, bucket, key,
    prior_cum + running sum); survivors keep open buckets; a period
    closes once bucketless and wm past its end."""
    out = []
    live = {}
    for p, (cum0, buckets) in periods.items():
        fin = sorted(b for b in buckets if b + step_ms <= wm)
        run = cum0
        for b in fin:
            run += buckets[b]
            out.append((p, b, key0, run))
        open_b = {b: n for b, n in buckets.items() if b + step_ms > wm}
        if open_b or not (wm > p + period_ms):
            live[p] = [run, open_b]
    timeout = None
    if live:
        timeout = min(
            (min(ent[1]) + step_ms) if ent[1] else (p + period_ms + step_ms)
            for p, ent in live.items()
        )
    return out, live, timeout


@settings(max_examples=300, deadline=None)
@given(data=st.data(), wm=st.integers(min_value=-5, max_value=120))
def test_cumulate_sweep_matches_spec(data, wm):
    step_ms, period_ms = 10, 40
    n_periods = data.draw(st.integers(min_value=0, max_value=3))
    periods = {}
    for i in range(n_periods):
        p = i * period_ms
        cum0 = data.draw(st.integers(min_value=0, max_value=100))
        buckets = data.draw(
            st.dictionaries(
                st.sampled_from([p, p + 10, p + 20, p + 30]),
                st.integers(min_value=1, max_value=9),
                max_size=4,
            )
        )
        if cum0 or buckets:
            periods[p] = [cum0, buckets]
    import copy

    want_out, want_live, want_timeout = _cumulate_spec(
        copy.deepcopy(periods), wm, step_ms, period_ms, "k"
    )
    got_out, got_live, got_timeout = _cumulate_sweep(
        copy.deepcopy(periods), wm, step_ms, period_ms, "k"
    )
    assert got_out == sorted(want_out)  # impl emits period-then-bucket order
    assert got_live == want_live
    assert got_timeout == want_timeout
