"""Z-order (Morton) clustering for multi-dimensional data skipping.

Range-clustering on ONE column (plans/sources.py q_sink_clustered) makes
single-dimension predicates prune files, but leaves every other column's
per-file min/max spanning the full domain. Interleaving the bits of two
key columns into one Morton code and range-clustering on THAT gives every
file a locality box in BOTH dimensions — the layout trick lakehouse
formats call Z-ordering/clustering, and the reason a 2-D box predicate
(part ∧ supplier, user ∧ day) can skip most files before any decode.

The code is a pure Column expression (32 static shift/mask terms —
whole-stage codegen, no UDF). Raw low bits are interleaved directly; at
100 TB, rank-normalize skewed or wide-domain keys first (exact ranks via
operators/ranking.global_rank, or approx_percentile bucket ids) so the
bit budget covers the populated domain — same expression afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` of two non-negative
    integer columns: bit i of x lands at position 2i, of y at 2i+1.
    Static shift/mask terms only — stays on the codegen path."""
    one = F.lit(1).cast("long")
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(one),
                        2 * i))
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(one),
                        2 * i + 1))
    return acc


def minmax_norm(col: Column, lo: Column, hi: Column,
                bits: int = 16) -> Column:
    """Scale a key onto the common ``bits``-wide grid Z-ordering needs:
    interleaving RAW values lets the wider-domain column's high bits
    dominate the code (the narrow column then gets no locality at all —
    its per-file span stays ~100%). ``floor((col-lo)·(2^bits-1)/(hi-lo))``
    with the domain bounds from a broadcast 1-row min/max aggregate;
    exact for key domains below 2^36 (the double mantissa bound on the
    scaled product). Monotone, so per-dimension pruning still works on
    the original column's footer stats."""
    span = F.when(hi > lo, (hi - lo).cast("double")).otherwise(F.lit(1.0))
    top = F.lit(float((1 << bits) - 1))
    return F.floor((col - lo).cast("double") * top / span).cast("long")
