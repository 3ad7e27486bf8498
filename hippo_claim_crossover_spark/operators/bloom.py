"""Broadcast Bloom-filter pruning for semi joins.

The scale problem: a semi join ``probe ⋉ build`` shuffles the ENTIRE probe
side on the key even when only a few percent of probe rows survive. Spark's
own runtime row-group filtering helps scans, not shuffles. The classic fix
is a Bloom filter of the build keys broadcast to the probe side: probe rows
that cannot match are dropped *before* the exchange, so the shuffle carries
only candidates (true matches + the filter's false-positive rate). A final
exact semi join removes false positives, so results are EXACT — the filter
only prunes, never decides.

Built entirely from built-in expressions (no UDF): k hash positions per
key via ``xxhash64(key, seed_i)``, one ``bit_or`` partial/final aggregate
packs set bits into ``m/64`` longs, a map→dense-array transform collapses
them to ONE broadcastable row. For n build keys the false-positive rate is
``(1 - e^(-k·n/m))^k`` — size ``m_bits ≳ 10·n`` for ~1%. The packed filter
is ``m/64`` longs = m/8 bytes (2^20 bits → 128 KiB), far under broadcast
limits; at 100 TB the probe-side exchange shrinks by the non-match
fraction, which is the dominant cost of selective semi joins.

The build subtree is read twice (filter build + exact verify) — the same
trade Spark's own runtime bloom-filter join makes; the two subtrees plan
an identical Exchange on the build key, which exchange reuse collapses to
one physical shuffle at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key``: pmod(xxhash64(key, i), m)."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def _mask(pos: Column) -> Column:
    """shiftleft(1L, pos mod 64) — the in-word bit mask (bit 63 lands on
    the sign bit; bit_or and the &-test below are sign-agnostic)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"),
        F.pmod(pos, F.lit(64)).cast("int"))


def bloom_build(keys: DataFrame, key_col: str,
                m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Aggregate the distinct values of ``keys[key_col]`` into a one-row
    DataFrame ``{words: array<long>}`` of length ``m_bits/64``.

    Two partial-agg-friendly shuffles on tiny data: bit_or per word index
    (≤ m/64 groups), then a single-row pack via map→dense array. Neither
    touches the driver."""
    assert m_bits % 64 == 0, m_bits
    n_words = m_bits // 64
    pos = (keys.select(F.col(key_col).alias("_k"))
           .select(F.explode(F.array(*_positions(F.col("_k"), m_bits, k)))
                   .alias("_pos")))
    word_bits = (pos.select(
        F.call_function("shiftright", F.col("_pos"), F.lit(6)).alias("word"),
        _mask(F.col("_pos")).alias("mask"))
        .groupBy("word").agg(F.bit_or("mask").alias("bits")))
    return (word_bits
            .agg(F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))).alias("_wmap"))
            .select(F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda w: F.coalesce(
                    F.try_element_at("_wmap", w.cast("long")),
                    F.lit(0).cast("long"))).alias("words")))


def bloom_may_contain(words: Column, key: Column,
                      m_bits: int = 1 << 17, k: int = 5) -> Column:
    """Membership test against a packed ``words`` array: true iff all k
    bits are set (false positives possible, false negatives never)."""
    cond = F.lit(True)
    for pos in _positions(key, m_bits, k):
        word = F.element_at(
            words,
            (F.call_function("shiftright", pos, F.lit(6)) + 1).cast("int"))
        cond = cond & (word.bitwiseAND(_mask(pos)) != 0)
    return cond


def bloom_semi_join(probe: DataFrame, probe_key: str,
                    build: DataFrame, build_key: str,
                    m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """EXACT ``probe ⋉ build`` with Bloom pre-pruning: broadcast the
    packed filter (1 row) onto the probe, drop impossible rows before
    the exchange, then exact left-semi join to kill false positives.

    The broadcast is a BroadcastNestedLoopJoin of a single row — not a
    cartesian product — and the final semi join shuffles only the
    candidate set. The verify join's key is routed through a guard
    column (``when(may_contain, key)``) whose definition references the
    filter row: without it, Catalyst's PushDownLeftSemiAntiJoin rule
    sinks the semi join BELOW the Bloom test (legal — its keys touch
    only the probe side), which re-shuffles the full probe and turns
    the filter into dead post-join work. The guard makes that rewrite
    ill-typed while keeping the equi-key identical on surviving rows."""
    keys = build.select(build_key).distinct()
    filt = bloom_build(keys, build_key, m_bits, k)
    cand = (probe.join(F.broadcast(filt))
            .withColumn("_bloom_key", F.when(
                bloom_may_contain(F.col("words"), F.col(probe_key),
                                  m_bits, k),
                F.col(probe_key)))
            .where(F.col("_bloom_key").isNotNull())
            .drop("words"))
    return (cand.join(keys, cand["_bloom_key"] == keys[build_key],
                      "left_semi")
            .drop("_bloom_key"))
