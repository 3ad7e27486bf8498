"""Property-based spot checks (SURVEY §5): the scalar expression helpers
vs plain-Python models of the reference semantics, over generated inputs.

Each hypothesis example builds ONE DataFrame from the generated list and
checks all rows vectorized (a Spark job per example — max_examples kept
small on purpose)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.functions.scalar import (
    fmt_diagnosis_code,
    fmt_postal_code,
    join_pointers,
)

_SETTINGS = dict(max_examples=8, deadline=None)

digits = st.text(alphabet=string.digits, min_size=0, max_size=12)
codes = st.text(alphabet=string.ascii_uppercase + string.digits,
                min_size=1, max_size=8)
maybe = lambda s: st.one_of(st.none(), s)  # noqa: E731


def _zip_model(z):
    if z is None:
        return None
    return f"{z[:5]}-{z[5:9]}" if len(z) == 9 else z[:5]


def _dx_model(c):
    if c is None:
        return None
    head = 4 if c.startswith("E") else 3
    if len(c) <= head:
        return c
    return c[:head] + "." + c[head:]


@settings(**_SETTINGS)
@given(st.lists(maybe(digits), min_size=1, max_size=30))
def test_postal_code_matches_model(spark, zips):
    df = spark.createDataFrame([(i, z) for i, z in enumerate(zips)],
                               "i int, z string")
    got = {r["i"]: r["out"]
           for r in df.select("i", fmt_postal_code(F.col("z")).alias("out"))
           .collect()}
    assert got == {i: _zip_model(z) for i, z in enumerate(zips)}


@settings(**_SETTINGS)
@given(st.lists(maybe(codes), min_size=1, max_size=30))
def test_diagnosis_code_matches_model(spark, cs):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cs)],
                               "i int, c string")
    got = {r["i"]: r["out"]
           for r in df.select(
               "i", fmt_diagnosis_code(F.col("c")).alias("out")).collect()}
    assert got == {i: _dx_model(c) for i, c in enumerate(cs)}


@settings(**_SETTINGS)
@given(st.lists(st.tuples(maybe(codes), maybe(codes), maybe(codes),
                          maybe(codes)), min_size=1, max_size=20))
def test_join_pointers_matches_ruby_join(spark, rows):
    # Ruby [p1..p4].join renders nil as "" — concat_ws must match exactly.
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "i int, p1 string, p2 string, p3 string, p4 string")
    got = {r["i"]: r["out"] for r in df.select(
        "i", join_pointers(F.col("p1"), F.col("p2"), F.col("p3"),
                           F.col("p4")).alias("out")).collect()}
    want = {i: "".join(p or "" for p in r) for i, r in enumerate(rows)}
    assert got == want
