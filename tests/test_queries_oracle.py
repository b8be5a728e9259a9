"""The local mirror of the driver's correctness gate: every registered
query with an oracle must match DuckDB on sf0.001 (row count, columns,
order-insensitive values)."""

from __future__ import annotations

import pytest

from openmetrics_spark.oracle import check_query
from openmetrics_spark.queries import all_queries

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    errs = check_query(spark, sf_dir, name)
    assert not errs, f"{name}: {errs}"


def test_every_query_has_unique_name():
    assert len(QUERY_NAMES) == len(set(QUERY_NAMES))


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def test_no_order_dependent_float_sums_in_oracles():
    """Regression guard for the q9/q10 hash-flip class: a
    ``round(sum(<double>), k)`` in an oracle depends on partial-agg
    order at the last ulp and can legitimately round differently per
    engine on a boundary. Every money/value aggregate must go through
    the exact scaled-integer pattern (functions/money.py). Allowlist:
    integral-column sums (exact in any order) and log-likelihood sums
    (inherently float, documented approximate, rounded at 4 dp)."""
    import re

    from openmetrics_spark.queries import all_queries

    allow = {
        # sums of an integral column — exact in any order
        "q1_pricing_summary": ["sum(l_quantity)"],
        # bn and w are BIGINTs (bucket counts x power-of-two weights)
        "decayed_user_counts": ["sum(bn * w)"],
        "streaming_decayed_counts": ["sum(bn * w)"],
        # -ln() sums cannot be quantized faithfully; both engines fold
        # the same doubles and the 4 dp round absorbs the tail
        "doc_unigram_logprob": ["sum(-ln("],
        "doc_unigram_logprob_capped": ["sum(-ln("],
        "doc_bigram_logprob": ["sum(-ln("],
        # every CASE branch is an exact BIGINT (CAST(floor …) / 0)
        "q8_market_share": ["SUM(CASE WHEN nation"],
        # c / rev_c are integral counts / exact cents — any-order exact
        "doc_dup_span_coverage": ["sum(c)"],
        "cumulate_hourly": ["sum(rev_c)"],
        # pow(int, 0.7) is irrational — unquantizable like the -ln()
        # sums; both engines fold identical doubles, round 6 absorbs
        "domain_mix_weights": ["sum(pow(n_tokens"],
    }
    def round_args(sql: str):
        """Yield the balanced-paren argument span of every round(...)
        — not just the immediately-nested callee, so shapes like
        ``round(100.00 * (SUM(x) / SUM(y)), 2)`` (the pre-fix q14
        form) are inspected too."""
        for m in re.finditer(r"\bround\s*\(", sql, re.I):
            depth, i = 1, m.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            yield sql[m.end() : i - 1]

    # a sum/avg is exempt only when its own operand starts with the
    # exact-integer quantization (CAST(floor(...))
    inner = re.compile(r"\b(sum|avg)\s*\(\s*(?!CAST\s*\(\s*floor)", re.I)
    offenders = []
    for name, spec in all_queries().items():
        if not spec.oracle:
            continue
        for arg in round_args(spec.oracle):
            for m in inner.finditer(arg):
                frag = arg[m.start() : m.end() + 40]
                if not any(
                    tok.lower() in frag.lower() for tok in allow.get(name, [])
                ):
                    offenders.append((name, frag.replace("\n", " ")))
    assert not offenders, offenders
