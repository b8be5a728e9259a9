"""Property test: the indexed `_decide_ready` (fk buckets + per-scope
ms-sorted buckets + bisect window) must equal the naive linear scan it
replaced, on RANDOM inputs — every scope model, null/empty scope
values, boundary-exact windows, tie-heavy timestamps. The staged-replay
gates pin it on realistic traffic; this pins it on the adversarial
corners (duplicate ms, colliding fk values, empty scope sets)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from openmetrics_spark.streaming.stateful import _decide_ready


def _linear_reference(views, ready, *, walk_idx, fk_i, content_i, before,
                      after, key0, right_outer):
    """The pre-r11 per-ready-row linear scan, verbatim."""
    def okey(v):
        return (v[2][fk_i] or "") if fk_i is not None else v[1]

    out = []
    for cms, cid, csc in ready:
        best = None
        if fk_i is not None and csc[fk_i] is not None:
            cands = [v for v in views if v[2][fk_i] == csc[fk_i]]
            if cands:
                best = min(cands, key=lambda v: (v[0], okey(v)))
        if best is None:
            rc = csc[content_i] if content_i is not None else None
            for s in walk_idx:
                if any(csc[i] is None or csc[i] == "" for i in s):
                    continue
                cands = [
                    v for v in views
                    if cms - before <= v[0] <= cms + after
                    and all(v[2][i] == csc[i] for i in s)
                    and (rc is None or rc == "" or v[2][content_i] == rc)
                ]
                if cands:
                    best = min(cands, key=lambda v: (abs(v[0] - cms), v[0], okey(v)))
                    break
        if best is not None:
            out.append((cid, key0, cms, best[1], best[0], False))
        elif right_outer:
            out.append((cid, key0, cms, None, None, False))
    return out


# scope values: small alphabet + null + empty so collisions and the
# null/empty skip rules fire constantly
_sv = st.sampled_from(["a", "b", "c", "", None])
_ms = st.integers(min_value=0, max_value=40)  # tie-heavy


@settings(max_examples=400, deadline=None)
@given(
    data=st.data(),
    n_sc=st.integers(min_value=0, max_value=3),
    mode=st.sampled_from(["prefix", "scopes", "scopes_fk", "scopes_fk_content"]),
    before=st.integers(min_value=0, max_value=15),
    after=st.integers(min_value=0, max_value=5),
    right_outer=st.booleans(),
)
def test_indexed_equals_linear(data, n_sc, mode, before, after, right_outer):
    if mode != "prefix" and n_sc == 0:
        n_sc = 1
    fk_i = 0 if mode.startswith("scopes_fk") else None
    content_i = n_sc - 1 if mode == "scopes_fk_content" and n_sc >= 2 else None
    if mode == "prefix":
        walk_idx = [list(range(k)) for k in range(n_sc, -1, -1)]
    else:
        # random walk over random scope subsets, always ending bare
        n_walk = data.draw(st.integers(min_value=1, max_value=3))
        walk_idx = [
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=n_sc - 1),
                    max_size=n_sc,
                    unique=True,
                )
            )
            for _ in range(n_walk)
        ] + [[]]

    rec = st.tuples(
        _ms,
        st.integers(min_value=0, max_value=10**6),
        st.lists(_sv, min_size=n_sc, max_size=n_sc),
    )
    views = [list(v) for v in data.draw(st.lists(rec, max_size=25))]
    # key-sort like the production sites: a raw sort of (ms, id, scopes)
    # tuples raises on (ms, id) ties with None-vs-str scope values —
    # the exact hazard this property test originally surfaced in the
    # production pending-sorts (fixed with explicit keys in r11)
    ready = sorted(
        ((v[0], v[1], list(v[2])) for v in data.draw(st.lists(rec, max_size=15))),
        key=lambda c: (c[0], c[1]),
    )
    kw = dict(
        walk_idx=walk_idx,
        fk_i=fk_i,
        content_i=content_i,
        before=before,
        after=after,
        key0="k",
        right_outer=right_outer,
    )
    assert _decide_ready(views, ready, **kw) == _linear_reference(
        views, ready, **kw
    )


def test_duplicate_rows_with_null_scopes_crash_regression(spark, tmp_path):
    """The input that used to raise: two IDENTICAL right rows (same ms,
    same id — pre-dedup duplicate traffic) alongside a third tying on
    (ms, id) semantics with a None scope value. The pending sort now
    keys on (ms, id) instead of comparing the scope lists, so the op
    must decide all rows instead of dying in the worker."""
    from pyspark.sql import functions as F

    from openmetrics_spark.streaming import run_to_memory, stream_from_dir
    from openmetrics_spark.streaming.stateful import stream_inferred_join
    from tests.test_streaming_skew import _staged_write

    base = 1_700_000_000_000
    views = [(1, 10, base, "a"), (1, 11, base + 1_000, None)]
    clicks = [
        (1, 50, base + 2_000, "a"),
        (1, 50, base + 2_000, None),  # duplicate id+ms, null scope
        (1, 50, base + 2_000, "a"),   # exact duplicate
    ]
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    vschema = "user_id LONG, vid LONG, ms LONG, k STRING"
    vdf = spark.createDataFrame(views, vschema).withColumn(
        "ts", F.timestamp_millis("ms")
    )
    sentinel = spark.createDataFrame(
        [(-1, -1, base + 60_000, "zz")], vschema
    ).withColumn("ts", F.timestamp_millis("ms"))
    _staged_write(vdf.unionByName(sentinel), vdir, 2, "ms", base, base + 60_000)
    cdf = spark.createDataFrame(
        clicks, "user_id LONG, cid LONG, ms LONG, k STRING"
    ).withColumn("ts", F.timestamp_millis("ms"))
    _staged_write(cdf, cdir, 2, "ms", base, base + 60_000)

    j = stream_inferred_join(
        stream_from_dir(spark, vdir, vdf.schema, max_files_per_trigger=1),
        stream_from_dir(spark, cdir, cdf.schema, max_files_per_trigger=1),
        user_col="user_id",
        left_id_col="vid",
        right_id_col="cid",
        left_ts_col="ts",
        right_ts_col="ts",
        scope_cols=("k",),
        window_before_ms=30_000,
        window_after_ms=0,
        delay_ms=1_000,
    )
    rows = run_to_memory(j, output_mode="append").filter(
        F.col("u") >= 0
    ).collect()
    assert len(rows) == 3  # every duplicate decided, none crashed
    for r in rows:
        assert r.left_id is not None  # bare-user fallback catches all
