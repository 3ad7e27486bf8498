"""Join operators Spark lacks natively, built Spark-first.

The reference's only join is the hierarchical parent-child denormalization
(SURVEY.md §2a J1-J5, ``lib/hippo_claim_crossover.rb:104-212``); these are
the scale-path extensions a batch-analytical engine needs beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof_impl(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               tolerance: str | None, forward: bool) -> DataFrame:
    """Shared body of :func:`asof_join` / :func:`asof_join_forward` —
    the union+window formulation, parameterized only by direction.

    The matched right row is carried as ONE STRUCT (payload columns +
    its timestamp), never as per-column first/last: carrying columns
    independently would let a NULL payload field in the matched row be
    silently back-filled from a farther right row, producing a mixed
    row no as-of semantics permits (and leaking values past the
    tolerance horizon). A right row's struct is non-null even when
    every payload field is NULL, so the carry is atomic.

    NULL timestamps have no position on the as-of axis, and the
    nulls-first sort would otherwise manufacture phantom matches on
    BOTH sides: a NULL-``right_ts`` row's non-null struct would be
    carried backward as a "match" (with NULL ``_rts``) for every left
    row preceding the first real right row, and a NULL-``left_ts`` row
    would sort before every right row and pick up the key's earliest
    right struct in the forward direction. So NULL-timestamp right
    rows are dropped up front (they can never be a match), while
    NULL-timestamp left rows are KEPT but their carried struct is
    nulled (left-outer semantics: the row survives with no match —
    DuckDB ASOF / pandas merge_asof agree)."""
    from pyspark.sql.types import StructField, StructType

    right = right.where(F.col(right_ts).isNotNull())

    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c != on]
    overlap = set(lcols) & set(rcols)
    if left_ts in rcols:
        overlap.add(left_ts)  # e.g. both sides call their timestamp 'ts'
    if overlap:
        raise ValueError(f"column overlap between sides: {sorted(overlap)}")
    internal = {"_k", "_ts", "_is_left", "_r", "_rts"}
    clash = internal & set(left.columns) | internal & set(right.columns)
    if clash:
        raise ValueError(
            f"input columns collide with asof_join internals: {sorted(clash)}")

    r_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in rcols]
        + [StructField("_rts", right.schema[right_ts].dataType)])
    tagged_l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols],
                 F.col(right_ts).alias("_rts")).alias("_r"),
    )
    if forward:
        # left rows first at equal ts => the same-ts right row is inside
        # the forward frame: inclusive
        w = (Window.partitionBy("_k").orderBy("_ts", F.desc("_is_left"))
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        carried = F.first("_r", ignorenulls=True).over(w)
    else:
        # right rows first at equal ts => inclusive backward match
        w = (Window.partitionBy("_k").orderBy("_ts", "_is_left")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = F.last("_r", ignorenulls=True).over(w)
    out = (
        tagged_l.unionByName(tagged_r)
        .select("_k", "_ts", "_is_left", *lcols,
                F.when(F.col("_ts").isNotNull(), carried).alias("_r"))
        .where(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        if forward:
            in_tol = (F.col("_r._rts")
                      <= F.col("_ts") + F.expr(f"INTERVAL {tolerance}"))
        else:
            in_tol = (F.col("_r._rts")
                      >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"))
        # null out the WHOLE matched row, never individual fields
        out = out.withColumn("_r", F.when(in_tol, F.col("_r")))
    return out.select(F.col("_k").alias(on), F.col("_ts").alias(left_ts),
                      *lcols,
                      *[F.col(f"_r.{c}").alias(c) for c in rcols])


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              tolerance: str | None = None) -> DataFrame:
    """As-of (backward) join: for each left row, attach the single right row
    with the greatest ``right_ts`` ≤ ``left_ts`` sharing the ``on`` key —
    left-outer semantics (no match ⇒ right columns NULL).

    100 TB design — the union+window formulation, NOT a range join:
    both sides are tagged and unioned, shuffled ONCE on the key, sorted
    within partitions by (ts, side), and each left row picks up the most
    recent right payload as one atomic struct via
    ``last(..., ignorenulls=True)`` over a running frame. Cost is one
    shuffle + one sort — no quadratic key×key range explosion, no
    per-row binary search on the driver. Skewed keys are handled by AQE
    the same as any other shuffle.

    Ties: right rows sort *before* left rows at an equal timestamp, so the
    join is inclusive (right_ts == left_ts matches). If the right side has
    several rows at the same (key, ts), pre-reduce it (e.g. keep max by a
    unique column) to keep results deterministic.

    ``tolerance``: optional SQL interval string (e.g. ``'30 days'``) — a
    match older than ``left_ts - tolerance`` is nulled out (the whole
    matched row at once), mirroring pandas ``merge_asof(tolerance=...)``.
    """
    return _asof_impl(left, right, on, left_ts, right_ts, tolerance,
                      forward=False)


def asof_join_forward(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      tolerance: str | None = None) -> DataFrame:
    """As-of FORWARD join: for each left row, the single right row with
    the LEAST ``right_ts`` ≥ ``left_ts`` sharing the key (pandas
    ``merge_asof(direction='forward')``) — time-to-next-event
    semantics. The direction mirror of :func:`asof_join`: same
    one-shuffle union+window shape, left rows sorted BEFORE right rows
    at equal timestamps (an equal-ts right row is inside the forward
    frame — inclusive match), carry via ``first(..., ignorenulls=True)``
    over the CURRENT-to-following frame. ``tolerance`` nulls out a
    match further than ``left_ts + tolerance``."""
    return _asof_impl(left, right, on, left_ts, right_ts, tolerance,
                      forward=True)


def asof_join_nearest(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str) -> DataFrame:
    """NEAREST as-of join: for each left row, the right row minimizing
    ``|right_ts − left_ts|`` over the key (pandas
    ``merge_asof(direction='nearest')``); an exact tie prefers the
    BACKWARD (earlier) match — deterministic and oracle-mirrored.

    Same one-shuffle union+window shape as :func:`asof_join`, but a
    single pass carries BOTH candidate structs: the running backward
    struct (``last`` ignorenulls over the preceding frame) and the
    forward struct (``first`` ignorenulls over the following frame),
    then picks by exact microsecond deltas (timestamp subtraction —
    DayTimeInterval comparison, never float seconds). With right rows sorted before left rows at an
    equal timestamp, an equal-ts right lands in the BACKWARD carry with
    delta 0, which beats any forward candidate — so the forward frame's
    equal-ts exclusivity under this sort can never change the answer.
    NULL-timestamp handling matches :func:`asof_join` (right NULLs are
    dropped up front; left NULLs survive unmatched). Timestamp-typed
    axes only. Pre-reduce a right side with duplicate (key, ts) rows,
    as with the other directions."""
    from pyspark.sql.types import StructField, StructType

    right = right.where(F.col(right_ts).isNotNull())

    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c != on]
    overlap = set(lcols) & set(rcols)
    if left_ts in rcols:
        overlap.add(left_ts)
    if overlap:
        raise ValueError(f"column overlap between sides: {sorted(overlap)}")
    internal = {"_k", "_ts", "_is_left", "_r", "_rts", "_b", "_f"}
    clash = internal & set(left.columns) | internal & set(right.columns)
    if clash:
        raise ValueError(
            f"input columns collide with asof_join internals: "
            f"{sorted(clash)}")

    r_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in rcols]
        + [StructField("_rts", right.schema[right_ts].dataType)])
    tagged_l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols],
                 F.col(right_ts).alias("_rts")).alias("_r"),
    )
    base = Window.partitionBy("_k").orderBy("_ts", "_is_left")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u = (tagged_l.unionByName(tagged_r)
         .withColumn("_b", F.when(F.col("_ts").isNotNull(),
                                  F.last("_r", ignorenulls=True).over(wb)))
         .withColumn("_f", F.when(F.col("_ts").isNotNull(),
                                  F.first("_r", ignorenulls=True).over(wf)))
         .where(F.col("_is_left") == 1))
    # timestamp subtraction yields a DayTimeInterval — exact microsecond
    # arithmetic for both TIMESTAMP and TIMESTAMP_NTZ axes (unix_micros
    # rejects NTZ), and intervals compare exactly
    db = F.col("_ts") - F.col("_b._rts")
    df_ = F.col("_f._rts") - F.col("_ts")
    pick = (F.when(F.col("_b").isNull(), F.col("_f"))
            .when(F.col("_f").isNull(), F.col("_b"))
            .when(df_ < db, F.col("_f"))
            .otherwise(F.col("_b")))
    out = u.withColumn("_r", pick)
    return out.select(F.col("_k").alias(on), F.col("_ts").alias(left_ts),
                      *lcols,
                      *[F.col(f"_r.{c}").alias(c) for c in rcols])


_SALTED_JOIN_HOW = {"inner", "left", "leftouter", "left_outer",
                    "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(big: DataFrame, skewed: DataFrame, on: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join under heavy key skew: salt the big side's key into
    ``salt`` sub-keys and explode the (small) skewed side once per salt
    value, so one hot key spreads over ``salt`` reducers instead of one.

    Only big-side-preserving join types are valid: the skewed side is
    replicated ``salt`` times, so right/full-outer would emit each
    unmatched skewed-side row once per replica — ``how`` is validated.
    The salt is round-robin over ``monotonically_increasing_id()`` rather
    than a hash of the row's columns, so fully-duplicate hot rows still
    spread across all ``salt`` reducers (a content hash would send every
    copy to the same sub-key, defeating the whole point).

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is the deterministic fallback for pathological keys (one key =
    half the table) or for engines/stages where AQE can't split (e.g.
    joins feeding a window over the same key).

    Sizing: pick ``salt`` a few × the reducer count, not equal to it —
    with salt == reducers the hot key's sub-keys average one per reducer
    but birthday collisions stack several on one. Measured on a zipfian
    key (hot key 40% of 100k rows, 32 reducers; tests/test_operators.py
    skew-stress): unsalted max-partition 13.6× the mean; salt=32 → 2.3×;
    salt=64 → 1.8×; salt=128+ → 1.4× (the floor set by the unsplittable
    non-hot keys). The cost of more salt is only dim-side replication.
    """
    if how.lower() not in _SALTED_JOIN_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALTED_JOIN_HOW)}, got {how!r}: "
            "the skewed side is replicated per salt value, so join types "
            "preserving unmatched skewed-side rows would duplicate them")
    big_s = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
        .cast("int"))
    skew_s = skewed.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = big_s.join(skew_s, [on, "_salt"], how)
    return out.drop("_salt")


def binned_interval_join(left: DataFrame, right: DataFrame,
                         l_start: str, l_end: str,
                         r_start: str, r_end: str,
                         bin_width: int) -> DataFrame:
    """Interval-overlap join (``l_start < r_end AND r_start < l_end``,
    half-open intervals on a LONG axis) as a BINNED equi-join — the
    standard sub-quadratic rewrite of a range join.

    A naive theta join plans as BroadcastNestedLoopJoin (O(|L|·|R|) —
    the cliff q_join_range documents). Here each interval is exploded
    into the fixed-width bins it overlaps, the join runs as a plain
    equi-join on the bin id (shuffle on a compact long key), and the
    true overlap predicate filters residually. A pair overlapping k
    shared bins would match k times, so the pair is kept only in ONE
    canonical bin — the bin of ``greatest(l_start, r_start)`` (the first
    instant both intervals are live, which both sides' bin ranges
    always contain): duplicate-free without any distinct shuffle.

    Cost ∝ Σ interval_len/bin_width + bin collision sizes: pick
    bin_width near the typical interval length (too fine explodes rows;
    too coarse re-densifies bins). Interval columns must be non-null
    longs (micros/epoch units); callers convert timestamps first.
    """
    lb = left.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(l_start) / bin_width),
            F.floor((F.col(l_end) - 1) / bin_width))))
    rb = right.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(r_start) / bin_width),
            F.floor((F.col(r_end) - 1) / bin_width))))
    overlap = ((lb[l_start] < rb[r_end]) & (rb[r_start] < lb[l_end]))
    canonical = (lb["_bin"] ==
                 F.floor(F.greatest(lb[l_start], rb[r_start]) / bin_width))
    return (lb.join(rb, (lb["_bin"] == rb["_bin"]) & overlap & canonical)
            .drop("_bin"))
