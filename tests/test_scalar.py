"""Unit tests for the scalar expression helpers — reference-semantics edge
cases per SURVEY.md §5.2 (E-codes, short codes, 9-digit zips, nil-safety
quirks B1-B7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippo_claim_crossover_spark.functions.scalar import (
    bool_eq,
    case_map,
    coalesce_pair,
    fmt_diagnosis_code,
    fmt_person_name,
    fmt_postal_code,
    join_pointers,
    ruby_to_f,
    ruby_to_i,
)


def _vals(spark, data, schema, expr):
    df = spark.createDataFrame(data, schema)
    return [r[0] for r in df.select(expr).collect()]


def test_fmt_diagnosis_code(spark):
    # reference lib/hippo_claim_crossover.rb:167-178: E-codes dot at 4,
    # others at 3; nil-safe; short codes pass through.
    out = _vals(spark,
                [("E1234",), ("V1234",), ("4019",), ("E123",), ("401",),
                 (None,)],
                "code string", fmt_diagnosis_code(F.col("code")))
    assert out == ["E123.4", "V12.34", "401.9", "E123", "401", None]


def test_fmt_postal_code(spark):
    # reference :180-186 — 9 digits → XXXXX-XXXX, else first 5.
    out = _vals(spark, [("123456789",), ("12345",), ("1234567",)],
                "zip string", fmt_postal_code(F.col("zip")))
    assert out == ["12345-6789", "12345", "12345"]


def test_fmt_person_name(spark):
    # reference :221-227 — person ('1') vs org; middle initial only when
    # present (concat_ws drops the null clause like Ruby's conditional).
    rows = [("1", "Doe", "Jane", "Quinn"), ("1", "Doe", "Jane", None),
            ("2", "Acme Corp", None, None)]
    out = _vals(spark, rows, "et string, last string, first string, mid string",
                fmt_person_name(F.col("et"), F.col("last"), F.col("first"),
                                F.col("mid")))
    assert out == ["Doe, Jane, Q", "Doe, Jane", "Acme Corp"]


def test_join_pointers_drops_nulls(spark):
    # reference :199 — Ruby Array#join renders nil as "".
    out = _vals(spark, [("1", None, "3", None)],
                "p1 string, p2 string, p3 string, p4 string",
                join_pointers(F.col("p1"), F.col("p2"), F.col("p3"),
                              F.col("p4")))
    assert out == ["13"]


def test_ruby_casts(spark):
    # reference :200-209 — nil.to_f == 0.0, nil.to_i == 0.
    assert _vals(spark, [("1.5",), (None,)], "x string",
                 ruby_to_f(F.col("x"))) == [1.5, 0.0]
    assert _vals(spark, [("7",), (None,)], "x string",
                 ruby_to_i(F.col("x"))) == [7, 0]


def test_bool_eq_null_is_false(spark):
    # reference :118 — Ruby nil == "A" is false, SQL NULL = 'A' is NULL.
    assert _vals(spark, [("A",), ("B",), (None,)], "x string",
                 bool_eq(F.col("x"), "A")) == [True, False, False]


def test_case_map(spark):
    # reference :60-66 / :229-235.
    m = {"01": "spouse", "19": "child"}
    assert _vals(spark, [("01",), ("19",), ("99",), (None,)], "x string",
                 case_map(F.col("x"), m, "other")) == \
        ["spouse", "child", "other", "other"]


def test_coalesce_pair_keeps_pairs_together(spark):
    # reference :245-259 — qualifier and number must come from the SAME
    # source; independent coalesces could mix sources.
    rows = [(None, "L2"), ("V1", None), (None, None)]
    pair = coalesce_pair((F.lit("REF"), F.col("a")), (F.lit("ZZ"), F.col("b")))
    df = spark.createDataFrame(rows, "a string, b string")
    got = [(r["q"], r["n"]) for r in df.select(
        pair.getField("qualifier").alias("q"),
        pair.getField("number").alias("n")).collect()]
    assert got == [("ZZ", "L2"), ("REF", "V1"), (None, None)]
