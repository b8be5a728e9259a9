"""Z-order (Morton) curve utilities for multi-dimensional layout.

Z-ordering is THE data-layout op for multi-dim pruning at scale:
interleaving the bits of two clustering keys makes rows that are close
in BOTH dimensions land in the same file/partition, so min/max file
stats prune range predicates on EITHER dimension (Delta/Iceberg
OPTIMIZE ZORDER does exactly this). The interleave is pure integer
bit math — exactly reproducible in any SQL engine — so the layout
decision itself can be driver hash-gated, not just plan-asserted.

Reference rationale: the reference's sinks partition by dt/hour only
(SURVEY §2.1); Z-order is the beyond-reference upgrade for tables
queried by more than the time axis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # each input clamped to 16 bits -> 32-bit z-values


def z_interleave(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton interleave of two non-negative ints (x in even bit
    positions, y in odd): a flat OR of 2*bits shift/mask terms —
    whole-stage codegen, no UDF. Inputs are masked to ``bits`` bits."""
    terms = []
    for i in range(bits):
        xb = F.shiftleft(
            F.shiftrightunsigned(x.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i,
        )
        yb = F.shiftleft(
            F.shiftrightunsigned(y.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
        terms.append(xb)
        terms.append(yb)
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def z_interleave_sql(x: str, y: str, bits: int = BITS) -> str:
    """The DuckDB-SQL spelling of :func:`z_interleave` (same bit ops,
    same term order — pure integer math, so values are identical)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
