"""Order-independent exact money/rate sums for cross-engine hashing.

``round(sum(double), k)`` depends on summation ORDER at the last ulp:
partial-aggregation order is nondeterministic, and when the true sum
sits on a rounding boundary Spark and DuckDB can legitimately round to
different values — the exact hash-mismatch class the round-4 verdict
flagged (observed live on q9/q10 at sf0.01). The cure: every value in
the data is an exact multiple of 1/scale (whole cents, whole percents
— asserted against the testdata), so ``floor(x*scale + 0.5)`` recovers
the exact integer per row (each step is one deterministic IEEE op
producing identical values in any engine), the BIGINT sum is exact in
any order, and ONE division returns the true total.

SQL twin: ``SUM(CAST(floor((e) * S + 0.5) AS BIGINT)) / S.0``.

Negative values: ``floor(x + 0.5)`` rounds exact halves toward +inf
(-3.005 → -300 cents, not -301). Both engines apply the identical
rule, so cross-engine equality is unaffected; it only matters if a
caller expects round-half-away semantics on negative money. One
caller is signed: q9's per-row profit (and its group sums) can be
negative — its half-toward-+inf rounding is accepted and documented
at ``sum_money4``; every other call site carries non-negative exact
multiples of 1/scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_units(expr, scale: int) -> Column:
    """Per-row exact integer count of 1/scale units."""
    return F.floor(expr * scale + F.lit(0.5)).cast("long")


def exact_sum(expr, scale: int) -> Column:
    """Order-independent sum via exact integer units (see module
    docstring)."""
    return F.sum(exact_units(expr, scale)) / float(scale)


def cents(expr) -> Column:
    """Per-row exact integer cents."""
    return exact_units(expr, 100)


def sum_cents(expr) -> Column:
    """Order-independent money sum in whole cents / 100."""
    return exact_sum(expr, 100)


def sum_money4(expr) -> Column:
    """Order-independent sum of a 4-decimal money expression (e.g.
    ``l_extendedprice * (1 - l_discount)``: 2dp price × 4dp factor),
    rounded half-up to whole cents IN INTEGER SPACE and returned at 2
    decimals — the ``round(sum(x), 2)`` semantics of the upstream
    TPC-H queries without the order-dependent last-ulp hazard.

    ``sum_cents`` on such an expression quantizes each ROW to cents
    before summing, drifting from the true total by ~0.003·√n per
    group; summing exact 1e-4 units first keeps the total exact, and
    the single floor(x/100 + 0.5) round is one deterministic IEEE op
    on an identical double in either engine.

    SQL twin:
    ``floor(SUM(CAST(floor((e) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0``

    Signed values (q9's profit can be negative per row AND per group):
    both the per-row quantize and the final cent round use
    floor(x + 0.5), which rounds exact halves toward +inf — identical
    in both engines (see module docstring's negative-values note)."""
    return F.floor(F.sum(exact_units(expr, 10000)) / F.lit(100.0) + F.lit(0.5)) / 100.0
