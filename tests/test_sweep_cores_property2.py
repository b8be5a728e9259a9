"""Independent-spec property tests for the remaining two stateful
decision cores (`_redundant_sweep`, `_latest_imps_sweep`) — the r11
round gave `_combine_sweep`/`_cumulate_sweep` this treatment (and the
combine one caught a real None-sort hazard); these close the set. The
streaming parity tests pin each core against its BATCH twin on
replayed traffic; here the cores meet independently-written specs on
random inputs — different data structures (assignment LIST scan vs
dict mutation; ascending-sort-reverse vs negated-key sort), so a
shared blind spot is unlikely."""

from __future__ import annotations

import copy

from hypothesis import given, settings
from hypothesis import strategies as st

from openmetrics_spark.streaming.stateful import (
    _latest_imps_sweep,
    _redundant_sweep,
)

# ---------------------------------------------------------------------------
# _redundant_sweep — ReduceRedundantTinyImpressions' per-key core
# ---------------------------------------------------------------------------


def _redundant_spec(epoch, remap, pending, wm, ttl_ms, retention):
    """Epoch timeline as a linear ASSIGNMENT LIST (last-wins scan)
    instead of the impl's dict mutation; same event-time order."""
    order = sorted(
        (p for p in pending if p[0] < wm),
        key=lambda p: (p[0], p[1], p[2], p[3] is not None, p[3] or ""),
    )
    rest = [p for p in pending if p[0] >= wm]
    assigns = [(k, v[0], v[1]) for k, v in remap.items()]
    cur = None if epoch is None else (epoch[0], epoch[1])
    out = []
    for ms, side, eid, ref in order:
        if side == 0:
            if cur is not None and ms <= cur[1]:
                assigns.append((eid, cur[0], cur[1]))
                out.append((0, eid, cur[0], True, ms))
            else:
                cur = (eid, ms + ttl_ms)
                out.append((0, eid, eid, False, ms))
        else:
            hits = [a for a in assigns if ref is not None and a[0] == ref]
            if ref is None:
                out.append((1, eid, None, False, ms))
            elif hits:
                out.append((1, eid, hits[-1][1], True, ms))
            else:
                out.append((1, eid, ref, False, ms))
    new_epoch = (
        None
        if cur is None or cur[1] + retention < wm
        else [cur[0], cur[1]]
    )
    new_remap = {}
    for k, c, e in assigns:  # later assignments overwrite (last wins)
        if e + retention >= wm:
            new_remap[k] = [c, e]
        else:
            new_remap.pop(k, None)
    return out, new_epoch, new_remap, rest


_EIDS = ["e0", "e1", "e2", "e3", "e4"]


@settings(max_examples=400, deadline=None)
@given(
    pending=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=1),
            st.sampled_from(_EIDS),
            st.one_of(st.none(), st.sampled_from(_EIDS)),
        ),
        max_size=16,
    ),
    carried_epoch=st.one_of(
        st.none(),
        st.tuples(
            st.sampled_from(_EIDS), st.integers(min_value=0, max_value=40)
        ),
    ),
    carried_remap=st.dictionaries(
        st.sampled_from(_EIDS),
        st.tuples(
            st.sampled_from(_EIDS), st.integers(min_value=0, max_value=40)
        ),
        max_size=3,
    ),
    wm=st.integers(min_value=-5, max_value=80),
    ttl_ms=st.integers(min_value=1, max_value=15),
    retention=st.integers(min_value=0, max_value=20),
)
def test_redundant_sweep_matches_spec(
    pending, carried_epoch, carried_remap, wm, ttl_ms, retention
):
    epoch = None if carried_epoch is None else list(carried_epoch)
    remap = {k: list(v) for k, v in carried_remap.items()}
    pend = [list(p) for p in pending]
    got_out, got_epoch, got_remap, got_pend = _redundant_sweep(
        copy.deepcopy(epoch),
        copy.deepcopy(remap),
        copy.deepcopy(pend),
        wm,
        ttl_ms,
        retention,
    )
    want_out, want_epoch, want_remap, want_pend = _redundant_spec(
        epoch, remap, pending, wm, ttl_ms, retention
    )
    assert got_out == want_out
    assert got_epoch == want_epoch
    assert got_remap == want_remap
    nkey = lambda p: (p[0], p[1], p[2], p[3] is not None, p[3] or "")  # noqa: E731
    assert sorted(map(tuple, got_pend), key=nkey) == sorted(
        map(tuple, want_pend), key=nkey
    )


# ---------------------------------------------------------------------------
# _latest_imps_sweep — AddLatestImpressions' per-key core
# ---------------------------------------------------------------------------


def _latest_spec(
    imps, first_act, pending, wm, max_state, max_output, lookback_ms, key0
):
    """Ascending-sort-then-reverse candidate ranking (unique ids make
    the order total) and set-style exclusion, vs the impl's negated
    sort key and get()-chain."""
    ready = sorted(a for a in pending if a[0] < wm)
    rest = [a for a in pending if a[0] >= wm]
    out = []
    for ams, aid, _ac in ready:
        window = [i for i in imps if ams - lookback_ms <= i[0] < ams]
        window = sorted(window, key=lambda i: (i[0], i[1]))[::-1]
        capped = window[:max_state]  # state cap BEFORE exclusion
        visible = [
            i
            for i in capped
            if not (i[2] in first_act and first_act[i[2]] <= ams)
        ]
        for rank, (ims, iid, ic) in enumerate(visible[:max_output], 1):
            out.append((aid, key0, rank, iid, ic, ams - ims))
    floor = min([wm] + [a[0] for a in rest]) - lookback_ms
    return (
        out,
        [i for i in imps if i[0] >= floor],
        {c: t for c, t in first_act.items() if t >= floor},
        rest,
    )


@settings(max_examples=400, deadline=None)
@given(data=st.data(), wm=st.integers(min_value=-5, max_value=70))
def test_latest_imps_sweep_matches_spec(data, wm):
    n_imps = data.draw(st.integers(min_value=0, max_value=12))
    # unique impression ids: (ms, id) ties with distinct payloads would
    # make the recency ranking ambiguous; upstream keep-first dedup
    # guarantees uniqueness in production
    iids = list(range(100, 100 + n_imps))
    imps = [
        (
            data.draw(st.integers(min_value=0, max_value=50)),
            iid,
            data.draw(st.integers(min_value=0, max_value=3)),
        )
        for iid in iids
    ]
    first_act = data.draw(
        st.dictionaries(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=60),
            max_size=4,
        )
    )
    pending = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=60),
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=3),
            ),
            max_size=8,
        )
    )
    max_state = data.draw(st.integers(min_value=1, max_value=5))
    max_output = data.draw(st.integers(min_value=1, max_value=5))
    lookback_ms = data.draw(st.integers(min_value=1, max_value=30))

    got_out, got_imps, got_fa, got_pend = _latest_imps_sweep(
        [list(i) for i in imps],
        dict(first_act),
        [list(a) for a in pending],
        wm,
        max_state=max_state,
        max_output=max_output,
        lookback_ms=lookback_ms,
        key0="k",
    )
    want_out, want_imps, want_fa, want_pend = _latest_spec(
        imps,
        first_act,
        pending,
        wm,
        max_state,
        max_output,
        lookback_ms,
        "k",
    )
    assert got_out == want_out
    assert sorted(map(tuple, got_imps)) == sorted(map(tuple, want_imps))
    assert got_fa == want_fa
    assert sorted(map(tuple, got_pend)) == sorted(map(tuple, want_pend))
