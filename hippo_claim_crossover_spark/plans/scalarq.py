"""Scalar-function queries: the reference's string/date/cast helpers (X1-X9)
exercised as declared queries over the fixtures.

Codes/zips/names are derived deterministically from numeric keys (the
fixtures carry no medical codes), then formatted by the pure-Column helpers
in ``functions/scalar.py`` — everything stays inside whole-stage codegen;
the single deliberate exception is ``q_udf``, which re-runs X1 as an
Arrow-batched pandas UDF to cover the UDF surface (SURVEY.md §2b).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.functions.scalar import (
    fmt_diagnosis_code,
    fmt_person_name,
    fmt_postal_code,
    join_pointers,
)
from hippo_claim_crossover_spark.plans.base import (
    QuerySpec,
    duck_round,
    money_sum_sql,
    t,
    t_wide,
)

# Derived diagnosis code: 'E'-class for every 5th part, else 'V'-class,
# zero-padded to 5 digits → 6-char codes exercising both insert positions.
# (Built lazily — Columns need an active SparkContext.)
def _code_spark():
    return F.concat(
        F.when(F.col("p_partkey") % 5 == 0, F.lit("E")).otherwise(F.lit("V")),
        F.lpad((F.col("p_partkey") % 100000).cast("string"), 5, "0"),
    )
_CODE_SQL = ("concat(CASE WHEN p_partkey % 5 = 0 THEN 'E' ELSE 'V' END, "
             "lpad(CAST(p_partkey % 100000 AS VARCHAR), 5, '0'))")


def q_str_dxcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 diagnosis-code decimal insertion (format_diagnosis_code,
    lib/hippo_claim_crossover.rb:167-178): E-codes dot after pos 4, others
    after pos 3."""
    return t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        _code_spark().alias("raw_code"),
        fmt_diagnosis_code(_code_spark()).alias("diagnosis_code"),
    )


ORACLE_STR_DXCODE = f"""
SELECT p_partkey AS part_id,
       {_CODE_SQL} AS raw_code,
       CASE WHEN {_CODE_SQL} LIKE 'E%'
            THEN substr({_CODE_SQL}, 1, 4) || '.' || substr({_CODE_SQL}, 5)
            ELSE substr({_CODE_SQL}, 1, 3) || '.' || substr({_CODE_SQL}, 4)
       END AS diagnosis_code
FROM part
"""


def q_str_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 postal-code formatting (format_postal_code,
    lib/hippo_claim_crossover.rb:180-186): 9-digit → XXXXX-XXXX else first 5.
    Even keys get 9-digit zips, odd keys 5-digit."""
    zip_col = F.when(
        F.col("c_custkey") % 2 == 0,
        F.lpad(((F.col("c_custkey") * 7919) % 1000000000).cast("string"), 9, "0"),
    ).otherwise(
        F.lpad(((F.col("c_custkey") * 7919) % 100000).cast("string"), 5, "0"),
    )
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("subscriber_id"),
        zip_col.alias("raw_zip"),
        fmt_postal_code(zip_col).alias("postal_code"),
    )


_ZIP_SQL = ("CASE WHEN c_custkey % 2 = 0 "
            "THEN lpad(CAST((c_custkey * 7919) % 1000000000 AS VARCHAR), 9, '0') "
            "ELSE lpad(CAST((c_custkey * 7919) % 100000 AS VARCHAR), 5, '0') END")
ORACLE_STR_ZIP = f"""
SELECT c_custkey AS subscriber_id,
       {_ZIP_SQL} AS raw_zip,
       CASE WHEN length({_ZIP_SQL}) = 9
            THEN substr({_ZIP_SQL}, 1, 5) || '-' || substr({_ZIP_SQL}, 6, 4)
            ELSE substr({_ZIP_SQL}, 1, 5)
       END AS postal_code
FROM customer
"""


def q_str_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 person/org name (get_name, lib/hippo_claim_crossover.rb:221-227):
    entity-type '1' → "Last, First[, M]" (middle clause dropped when null),
    else org name. concat_ws's null-dropping mirrors Ruby's conditional
    append."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    etype = F.when(F.col("s_suppkey") % 3 == 0, F.lit("1")).otherwise(F.lit("2"))
    middle = F.nullif(F.col("n_name"), F.lit("NATION_0"))
    return j.select(
        F.col("s_suppkey").alias("provider_id"),
        fmt_person_name(etype, F.col("s_name"), F.col("n_name"), middle)
        .alias("provider_name"),
    )


ORACLE_STR_NAME = """
SELECT s.s_suppkey AS provider_id,
       CASE WHEN (CASE WHEN s.s_suppkey % 3 = 0 THEN '1' ELSE '2' END) = '1'
            THEN concat_ws(', ', s.s_name, n.n_name,
                           substr(nullif(n.n_name, 'NATION_0'), 1, 1))
            ELSE s.s_name END AS provider_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


def q_str_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 pointer join ([p1..p4].join with nil → "",
    lib/hippo_claim_crossover.rb:199): concat_ws('') drops nulls, matching
    Ruby Array#join."""
    li = t(spark, sf_dir, "lineitem")
    p1 = F.when(F.col("l_linenumber") >= 1, F.lit("1"))
    p2 = F.when(F.col("l_linenumber") >= 2, F.lit("2"))
    p3 = F.when(F.col("l_linenumber") >= 3, F.lit("3"))
    p4 = F.when(F.col("l_linenumber") >= 4, F.lit("4"))
    return li.select(
        F.col("l_orderkey").alias("claim_id"),
        F.col("l_linenumber").alias("service_line"),
        join_pointers(p1, p2, p3, p4).alias("diagnosis_pointers"),
    )


ORACLE_STR_JOIN = """
SELECT l_orderkey AS claim_id, l_linenumber AS service_line,
       concat_ws('',
         CASE WHEN l_linenumber >= 1 THEN '1' END,
         CASE WHEN l_linenumber >= 2 THEN '2' END,
         CASE WHEN l_linenumber >= 3 THEN '3' END,
         CASE WHEN l_linenumber >= 4 THEN '4' END) AS diagnosis_pointers
FROM lineitem
"""


def q_date_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 date→string (DateTimePeriod.to_s, lib/hippo_claim_crossover.rb:108,
    :113-115, :191)."""
    return t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("claim_id"),
        F.col("l_linenumber").alias("service_line"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("service_date"),
        F.date_format("l_shipdate", "MM/dd/yyyy").alias("service_date_us"),
    )


ORACLE_DATE_FMT = """
SELECT l_orderkey AS claim_id, l_linenumber AS service_line,
       strftime(l_shipdate, '%Y-%m-%d') AS service_date,
       strftime(l_shipdate, '%m/%d/%Y') AS service_date_us
FROM lineitem
"""


def q_range_ends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 range endpoints (DateTimePeriod.first/.last,
    lib/hippo_claim_crossover.rb:126) — on the embeddings array: first/last
    element. All arrays are length 64, so element_at is ANSI-safe.

    Embedding components are sign-mixed, so the 6dp rounding uses the
    floor formula on BOTH sides (duck_round here, the same expression in
    the oracle) — the one construction that is bit-identical across
    engines for any sign; engine-native round()s differ in halfway mode
    and representation on negatives."""
    return t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        duck_round(F.element_at("embedding", 1).cast("double"), 6)
        .alias("first_dim"),
        duck_round(F.element_at("embedding", -1).cast("double"), 6)
        .alias("last_dim"),
    )


ORACLE_RANGE_ENDS = """
SELECT vec_id,
       floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS first_dim,
       floor(CAST(embedding[64] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS last_dim
FROM embeddings
"""


def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 casts with Ruby nil parity (.to_f of nil = 0.0,
    lib/hippo_claim_crossover.rb:200-209): try_cast keeps ANSI mode happy,
    coalesce supplies the Ruby default."""
    li = t(spark, sf_dir, "lineitem")
    qty_str = F.concat(F.col("l_quantity").cast("int").cast("string"))
    bad = F.when(F.col("l_linenumber") == 1, F.lit("n/a")).otherwise(qty_str)
    return li.select(
        F.col("l_orderkey").alias("claim_id"),
        F.col("l_linenumber").alias("service_line"),
        F.coalesce(bad.try_cast("double"), F.lit(0.0)).alias("units_f"),
        F.coalesce(bad.try_cast("long"), F.lit(0)).alias("units_i"),
        F.col("l_quantity").cast("int").cast("string").alias("units_s"),
    )


ORACLE_CAST = """
SELECT l_orderkey AS claim_id, l_linenumber AS service_line,
       coalesce(TRY_CAST(CASE WHEN l_linenumber = 1 THEN 'n/a'
                 ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS DOUBLE), 0.0) AS units_f,
       coalesce(TRY_CAST(CASE WHEN l_linenumber = 1 THEN 'n/a'
                 ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS BIGINT), 0) AS units_i,
       CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS units_s
FROM lineitem
"""


def q_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2b UDF surface: X1 re-expressed as an Arrow-batched pandas UDF.
    Deliberately the slow path (SURVEY.md "UDFs are the slow path") — kept
    vectorized so the only tax is Arrow transfer, not per-row Python."""

    @F.pandas_udf("string")
    def dx_format(codes: pd.Series) -> pd.Series:
        def _fmt(code):
            if code is None:
                return None
            pos = 4 if code.startswith("E") else 3
            if len(code) <= pos:
                return code
            return code[:pos] + "." + code[pos:]
        return codes.map(_fmt, na_action="ignore")

    return t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        dx_format(_code_spark()).alias("diagnosis_code"),
    )


ORACLE_UDF = f"""
SELECT p_partkey AS part_id,
       CASE WHEN {_CODE_SQL} LIKE 'E%'
            THEN substr({_CODE_SQL}, 1, 4) || '.' || substr({_CODE_SQL}, 5)
            ELSE substr({_CODE_SQL}, 1, 3) || '.' || substr({_CODE_SQL}, 4)
       END AS diagnosis_code
FROM part
"""


def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2b UDF surface, zero-copy tier: ``mapInArrow`` — each batch
    arrives as a pyarrow RecordBatch (no pandas materialization at all,
    one level below pandas_udf), and the kernel is numpy over the
    ListArray's flat values buffer: one vectorized pass for thousands of
    vectors, no per-row Python.

    Hash-checkability inside a Python kernel: per-element squared-micros
    (``floor(x²·1e12+0.5)`` as int64) summed per vector with
    ``np.add.reduceat`` — exact integer arithmetic, so the fold order
    numpy picks is irrelevant and DuckDB's ``list_sum`` of the identical
    BIGINT terms matches bit-for-bit (the money_sum discipline applied
    inside a UDF). Per-vector sums stay ≤ ~1e15, far under int64.
    float32 values are widened to float64 *before* squaring, mirroring
    the oracle's CAST(embedding AS DOUBLE[])."""
    import numpy as np
    import pyarrow as pa

    e = t_wide(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def norms(batches):
        for b in batches:
            vid = b.column(0)
            emb = b.column(1)
            offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = emb.values.to_numpy(zero_copy_only=False)
            # a sliced ListArray's offsets are absolute into the shared
            # values buffer: trim + rebase so reduceat's last segment
            # ends exactly at the final offset
            vals = vals[offs[0]:offs[-1]].astype(np.float64)
            offs = offs - offs[0]
            sq = np.floor(vals * vals * 1e12 + 0.5).astype(np.int64)
            seg = np.add.reduceat(sq, offs[:-1])
            nrm = np.sqrt(seg.astype(np.float64) / 1e12)
            nrm4 = np.floor(nrm * 1e4 + 0.5) / 1e4
            yield pa.RecordBatch.from_arrays(
                [vid, pa.array(nrm4, pa.float64())], ["vec_id", "nrm"])

    return e.mapInArrow(norms, "vec_id long, nrm double")


ORACLE_UDF_ARROW = """
SELECT vec_id,
       floor(sqrt(CAST(list_sum(list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> CAST(floor(x * x * 1e12 + 0.5) AS BIGINT)))
         AS DOUBLE) / 1e12) * 1e4 + 0.5) / 1e4 AS nrm
FROM embeddings
"""


_CHUNK_TOKENS = 10


def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2b UDF surface, table-function tier: a Python UDTF applied per
    row through a LATERAL join — each document expands to one row per
    10-token chunk with its ordinal (the RAG/context-window chunking
    pass; arbitrary-arity expansion neither scalar UDFs nor
    explode-over-builtins cover when the chunking logic is Python).
    Registered and invoked through SQL LATERAL, which also exercises
    Spark's lateral-correlation planning.

    Scale posture: UDTF eval is the Python slow path (documented) —
    declared to cover the surface, kept out of hot paths. The chunking
    is deterministic string work, so the output still hash-checks
    against DuckDB's zipped-unnest oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, chunk string")
    class _ChunkSplit:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), _CHUNK_TOKENS):
                yield (i // _CHUNK_TOKENS + 1,
                       " ".join(toks[i:i + _CHUNK_TOKENS]))

    spark.udtf.register("chunk_split", _ChunkSplit)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
      SELECT d.doc_id, c.pos, c.chunk
      FROM documents d, LATERAL chunk_split(d.text) c
    """)


_N_CHUNKS = ("CAST(ceil(len(string_split(text, ' ')) / "
             f"{_CHUNK_TOKENS}.0) AS BIGINT)")
ORACLE_UDTF = f"""
SELECT doc_id,
       CAST(unnest(range(1, {_N_CHUNKS} + 1)) AS INTEGER) AS pos,
       unnest(list_transform(range(1, {_N_CHUNKS} + 1),
              i -> array_to_string(list_slice(string_split(text, ' '),
                   (i - 1) * {_CHUNK_TOKENS} + 1, i * {_CHUNK_TOKENS}),
                   ' '))) AS chunk
FROM documents
"""


def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` — the per-group pandas surface
    (one Arrow batch per group, full group visible to the kernel):
    per-subscriber z-score normalization of claim totals, the feature-
    normalization step that genuinely needs whole-group context.

    Cross-engine determinism: money enters the kernel as exact integer
    CENTS (floor(x·100+0.5) — int64-safe for the squared sums the
    variance needs, where micros² would overflow), the kernel folds
    exact integer n/Σx/Σx² per subscriber and only then switches to the
    same IEEE float expression the oracle SQL spells out, finishing
    with the floor-rounding formula on BOTH sides (z is signed, so
    DuckDB's own round() would disagree at negative halfway points —
    the oracle uses the identical floor expression instead).

    Scale shape — the small-groups rule: grouping by the raw customer
    key means one kernel invocation per ~10-row group (measured 24s at
    sf0.1's 15k groups — per-call pandas overhead, not compute). The
    shuffle key is instead a SHARD (``pmod(custkey, 64)``) that keeps
    every customer wholly inside one kernel call, and the kernel does
    the per-customer math vectorized with pandas groupby-transform —
    64 calls total, identical output (0.7s). Same rule at 100 TB:
    applyInPandas shuffle keys should be coarse; fine-grained grouping
    belongs INSIDE the kernel."""
    import numpy as np

    o = (t(spark, sf_dir, "orders")
         .select("o_custkey", "o_orderkey",
                 F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                 .cast("long").alias("cents"),
                 F.pmod(F.col("o_custkey"), F.lit(64)).alias("shard")))

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("o_custkey")["cents"]
        n = g.transform("size").to_numpy()
        s = g.transform("sum").to_numpy()          # exact int64
        sq = pdf["cents"] * pdf["cents"]
        ss = (sq.groupby(pdf["o_custkey"]).transform("sum")
              .to_numpy())                         # exact int64
        mean = s.astype(np.float64) / n
        var = ss.astype(np.float64) / n - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        z = np.zeros(len(pdf))
        np.divide(pdf["cents"].to_numpy() - mean, std, out=z,
                  where=var > 0)
        z = np.floor(z * 1e4 + 0.5) / 1e4
        return pd.DataFrame({
            "claim_id": pdf["o_orderkey"],
            "subscriber_id": pdf["o_custkey"],
            "z": z,
        })

    return o.groupBy("shard").applyInPandas(
        zscore, "claim_id long, subscriber_id long, z double")


ORACLE_UDF_GROUPED = """
WITH c AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
st AS (
  SELECT o_custkey, count(*) AS n,
         sum(cents) AS s, sum(cents * cents) AS ss
  FROM c GROUP BY o_custkey),
m AS (
  SELECT o_custkey, n,
         CAST(s AS DOUBLE) / n AS mean,
         CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n)
           * (CAST(s AS DOUBLE) / n) AS var
  FROM st)
SELECT c.o_orderkey AS claim_id, c.o_custkey AS subscriber_id,
       CASE WHEN m.var > 0
            THEN floor(((c.cents - m.mean) / sqrt(m.var)) * 1e4 + 0.5)
                 / 1e4
            ELSE 0.0 END AS z
FROM c JOIN m ON c.o_custkey = m.o_custkey
"""


def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-table per-key pandas
    surface (both groups delivered to ONE kernel call): claims and
    events aligned per subscriber into a combined activity profile.
    Each side is co-shuffled on the key, so the kernel sees the full
    pair of groups with no join beforehand — the escape hatch for
    per-key logic spanning two tables that SQL joins can't express
    (sequence alignment, per-key reconciliation). Here the kernel's
    fold is deliberately SQL-expressible (exact integer cents/counts)
    so the full-outer-join oracle hash-checks the plumbing: keys
    present on either side must appear exactly once, empty sides as
    zeros.

    Cogrouped on a SHARD key (``pmod(key, 64)``), not the raw
    subscriber key — the same small-groups rule as q_udf_grouped: the
    kernel outer-merges the two sides' per-key rollups inside the
    shard (pandas groupby + outer join), so 64 kernel calls replace
    one per subscriber (measured 18.6s → sub-second at sf0.1)."""
    o = (t(spark, sf_dir, "orders")
         .select(F.col("o_custkey").alias("k"),
                 F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                 .cast("long").alias("cents"),
                 F.pmod(F.col("o_custkey"), F.lit(64)).alias("shard")))
    e = (t(spark, sf_dir, "events")
         .select(F.col("user_id").alias("k"),
                 F.floor(F.col("value") * 100 + F.lit(0.5))
                 .cast("long").alias("vcents"),
                 F.pmod(F.col("user_id"), F.lit(64)).alias("shard")))

    def _empty(cols: list[str]) -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in cols},
            index=pd.Index([], dtype="int64", name="k"))

    def profile(odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        os_ = (odf.groupby("k")
               .agg(n_orders=("cents", "size"),
                    order_cents=("cents", "sum"))
               if len(odf) else _empty(["n_orders", "order_cents"]))
        es = (edf.groupby("k")
              .agg(n_events=("vcents", "size"),
                   event_cents=("vcents", "sum"))
              if len(edf) else _empty(["n_events", "event_cents"]))
        m = os_.join(es, how="outer").fillna(0).astype("int64")
        m.index.name = "subscriber_id"
        return m.reset_index()

    return (o.groupBy("shard")
            .cogroup(e.groupBy("shard"))
            .applyInPandas(profile,
                           "subscriber_id long, n_orders long, "
                           "order_cents long, n_events long, "
                           "event_cents long"))


ORACLE_UDF_COGROUPED = """
WITH o AS (
  SELECT o_custkey AS k, count(*) AS n_orders,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           AS order_cents
  FROM orders GROUP BY o_custkey),
e AS (
  SELECT user_id AS k, count(*) AS n_events,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS event_cents
  FROM events GROUP BY user_id)
SELECT coalesce(o.k, e.k) AS subscriber_id,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(order_cents, 0) AS BIGINT) AS order_cents,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(event_cents, 0) AS BIGINT) AS event_cents
FROM o FULL OUTER JOIN e ON o.k = e.k
"""


def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF (``CREATE FUNCTION ... RETURN <expr>``): the
    engine-native way to share scalar business logic across queries —
    unlike a Python UDF it inlines into the plan at resolution time, so
    it costs nothing at runtime (stays inside whole-stage codegen, no
    Python worker, filters through it still push down).

    The function bands an order total into pricing tiers; the query
    groups by the banded tier. The oracle inlines the identical CASE —
    which is exactly what Catalyst does with the UDF body.
    """
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(total DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN total >= 300000 THEN 'platinum'
                    WHEN total >= 150000 THEN 'gold'
                    WHEN total >=  50000 THEN 'silver'
                    ELSE 'bronze' END
    """)
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_sqludf")
    # money_sum_sql runs verbatim in Spark SQL: the sum rides exact
    # integer micros and lands ON the 6dp grid, where Spark round and
    # DuckDB round agree (plans/base.py money_sum notes).
    return spark.sql(f"""
        SELECT price_tier(o_totalprice) AS tier,
               count(*) AS n_orders,
               {money_sum_sql("o_totalprice")} AS sum_total
        FROM orders_sqludf
        GROUP BY price_tier(o_totalprice)
    """)


ORACLE_SQL_UDF = f"""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'platinum'
            WHEN o_totalprice >= 150000 THEN 'gold'
            WHEN o_totalprice >=  50000 THEN 'silver'
            ELSE 'bronze' END AS tier,
       count(*) AS n_orders,
       {money_sum_sql("o_totalprice")} AS sum_total
FROM orders
GROUP BY 1
"""


def q_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scalar surface beyond X6's strftime: month-end snapping
    (``last_day``), clamped month arithmetic (``add_months`` — Jan 31 +
    3 months = Apr 30, the billing-cycle rule naive day-addition gets
    wrong), ISO week numbers, quarters, and day-of-week. All pure
    Column expressions on the codegen path; the oracle maps each onto
    DuckDB's calendar functions (dayofweek is offset by one: Spark
    counts Sunday=1, DuckDB Sunday=0)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_orderdate")
    # DATE results ride as midnight TIMESTAMP_NTZ: the oracle compare
    # normalizes through pandas, which renders DuckDB DATEs as
    # datetimes — emitting timestamps on both sides keeps the hash
    # type-exact.
    return o.select(
        F.col("o_orderkey").alias("claim_id"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.weekofyear(d).alias("iso_week"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
    )


ORACLE_CALENDAR = """
SELECT o_orderkey AS claim_id,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)
         AS plus_3m,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
FROM orders WHERE o_orderkey % 20 = 0
"""


def q_hof_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface over the embedding column:
    ``transform`` (fixed-point conversion), ``filter`` (positive-element
    count), ``aggregate`` (exact int64 sum-of-squares → L2 norm), and
    ``zip_with`` (dot with the reversed vector) — the whole HOF family in
    one row-local pass, the declarative alternative to a Python UDF for
    per-row vector math.

    Exactness: every fold runs on int64 micros (``floor(CAST(float AS
    DOUBLE)*1e6+0.5)``), so the sums are order-insensitive and both
    engines divide/sqrt the same exact integer.  No shuffle at all —
    the entire query is the scan stage plus a TakeOrdered 50.
    """
    d = t_wide(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (d
            .withColumn("m", F.expr(
                "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
                "* 1e6 + 0.5) AS BIGINT))"))
            .select(
                "vec_id",
                F.size("embedding").alias("n_dims"),
                F.expr("size(filter(embedding, x -> x > CAST(0.0 AS "
                       "FLOAT)))").alias("n_pos"),
                F.expr("floor(sqrt(CAST(aggregate(m, 0L, (acc, x) -> "
                       "acc + x * x) AS DOUBLE) / 1e12) * 1e6 + 0.5) "
                       "/ 1e6").alias("l2_norm"),
                F.expr("floor(CAST(aggregate(zip_with(m, reverse(m), "
                       "(x, y) -> x * y), 0L, (acc, p) -> acc + p) "
                       "AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6")
                .alias("dot_reversed"))
            .orderBy("vec_id")
            .limit(50))


ORACLE_HOF_ARRAY = """
WITH m_t AS (
  SELECT vec_id,
         len(embedding) AS n_dims,
         len(list_filter(embedding, x -> x > 0)) AS n_pos,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS m
  FROM embeddings
)
SELECT vec_id, n_dims, n_pos,
       floor(sqrt(CAST(list_aggregate(
               list_transform(m, x -> x * x), 'sum') AS DOUBLE) / 1e12)
             * 1e6 + 0.5) / 1e6 AS l2_norm,
       floor(CAST(list_aggregate(
               list_transform(range(1, n_dims + 1),
                              i -> m[i] * m[n_dims + 1 - i]), 'sum')
             AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS dot_reversed
FROM m_t ORDER BY vec_id LIMIT 50
"""


SPECS: dict[str, QuerySpec] = {
    "q_hof_array": QuerySpec(
        q_hof_array, ORACLE_HOF_ARRAY,
        "higher-order array functions: transform/filter/aggregate/"
        "zip_with in one codegen pass"),
    "q_sql_udf": QuerySpec(q_sql_udf, ORACLE_SQL_UDF,
                           "Spark 4 SQL UDF (inlined scalar function)"),
    "q_calendar": QuerySpec(q_calendar, ORACLE_CALENDAR,
                            "calendar scalars: last_day / clamped "
                            "add_months / ISO week / quarter / dow"),
    "q_str_dxcode": QuerySpec(q_str_dxcode, ORACLE_STR_DXCODE, "X1"),
    "q_str_zip": QuerySpec(q_str_zip, ORACLE_STR_ZIP, "X2"),
    "q_str_name": QuerySpec(q_str_name, ORACLE_STR_NAME, "X3"),
    "q_str_join": QuerySpec(q_str_join, ORACLE_STR_JOIN, "X4"),
    "q_date_fmt": QuerySpec(q_date_fmt, ORACLE_DATE_FMT, "X6"),
    "q_range_ends": QuerySpec(q_range_ends, ORACLE_RANGE_ENDS, "X7"),
    "q_cast": QuerySpec(q_cast, ORACLE_CAST, "X8"),
    "q_udf": QuerySpec(q_udf, ORACLE_UDF, "pandas UDF mirror of X1"),
    "q_udf_arrow": QuerySpec(q_udf_arrow, ORACLE_UDF_ARROW,
                             "mapInArrow exact-integer norms"),
    "q_udtf": QuerySpec(q_udtf, ORACLE_UDTF,
                        "Python UDTF via LATERAL (sentence expansion)"),
    "q_udf_grouped": QuerySpec(q_udf_grouped, ORACLE_UDF_GROUPED,
                               "grouped-map applyInPandas z-score"),
    "q_udf_cogrouped": QuerySpec(q_udf_cogrouped, ORACLE_UDF_COGROUPED,
                                 "cogrouped applyInPandas two-table "
                                 "profile"),
}
