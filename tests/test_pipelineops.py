"""Semantics tests for the round-4 pipeline operators: GROUPING SETS,
sequence packing, and the ordered funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippo_claim_crossover_spark.plans import ALL_SPECS
from hippo_claim_crossover_spark.plans.text import _PACK_BUDGET


def test_grouping_sets_row_count_is_sum_of_sets(spark, sf_dir):
    """Output = one row per (flag,status) combo + one per flag + one per
    status — the non-lattice set list, distinct from rollup/cube."""
    from hippo_claim_crossover_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    combos = li.select("l_returnflag", "l_linestatus").distinct().count()
    flags = li.select("l_returnflag").distinct().count()
    statuses = li.select("l_linestatus").distinct().count()
    got = ALL_SPECS["q_grouping_sets"].fn(spark, sf_dir).count()
    assert got == combos + flags + statuses


def test_grouping_sets_single_expand(spark, sf_dir):
    """All three sets come out of ONE Expand + aggregate — never one pass
    per set over the table."""
    df = ALL_SPECS["q_grouping_sets"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert "HashAggregate" in plan


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing is a per-source running sum: first doc of each source
    starts at token 0, offsets stay inside the budget, and consecutive
    docs are contiguous (start = previous start + previous length)."""
    rows = (ALL_SPECS["q_pack_sequences"].fn(spark, sf_dir)
            .orderBy("source", "doc_id").collect())
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert len(by_source) > 1  # packing is sharded, not global
    for docs in by_source.values():
        assert docs[0].start_tok == 0
        for prev, cur in zip(docs, docs[1:]):
            assert cur.start_tok == prev.start_tok + prev.n_tokens
        for d in docs:
            assert 0 <= d.offset_in_bin < _PACK_BUDGET
            assert d.bin_id == d.start_tok // _PACK_BUDGET
            span = (d.start_tok + d.n_tokens - 1) // _PACK_BUDGET - d.bin_id + 1
            assert d.bins_spanned == span >= 1


def test_funnel_is_monotone(spark, sf_dir):
    """Each funnel stage can only lose users, and ordering matters: the
    clicked_after_view count is ≤ the unordered view∩click user count."""
    got = {r.stage: r.n_users
           for r in ALL_SPECS["q_funnel"].fn(spark, sf_dir).collect()}
    assert set(got) == {"viewed", "clicked_after_view",
                        "purchased_after_click"}
    assert got["viewed"] >= got["clicked_after_view"] >= (
        got["purchased_after_click"])

    from hippo_claim_crossover_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    both = (e.groupBy("user_id")
            .agg(F.sum(F.when(F.col("event_type") == "view", 1)
                       .otherwise(0)).alias("v"),
                 F.sum(F.when(F.col("event_type") == "click", 1)
                       .otherwise(0)).alias("c"))
            .where((F.col("v") > 0) & (F.col("c") > 0)).count())
    assert got["clicked_after_view"] <= both


def test_decontaminate_rates_bounded_and_planted_hit(spark, sf_dir):
    """Rates live in [0,1] with n_contaminated ≤ n_sh; only eval-source
    docs appear."""
    from hippo_claim_crossover_spark.io import load_table
    from hippo_claim_crossover_spark.plans.dedup import EVAL_SOURCE

    rows = ALL_SPECS["q_decontaminate"].fn(spark, sf_dir).collect()
    assert rows
    ev_ids = {r.doc_id for r in load_table(spark, sf_dir, "documents")
              .where(F.col("source") == EVAL_SOURCE).collect()}
    for r in rows:
        assert r.doc_id in ev_ids
        assert 0 <= r.n_contaminated <= r.n_sh
        assert 0.0 <= r.contamination_rate <= 1.0


def test_decontaminate_detects_verbatim_leak(spark):
    """A train document duplicated verbatim into the eval split must come
    back 100% contaminated; a disjoint-vocabulary doc must be 0%."""
    from hippo_claim_crossover_spark.operators import dedup as ops_dedup
    from pyspark.sql import functions as SF

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    clean = "uno dos tres cuatro cinco seis siete ocho"
    docs = spark.createDataFrame(
        [(1, leak, "evalsrc"), (2, clean, "evalsrc"),
         (3, leak + " iota kappa", "trainsrc")],
        "doc_id long, text string, source string")
    ev = docs.where(SF.col("source") == "evalsrc")
    tr = docs.where(SF.col("source") != "evalsrc")
    ev_sh = ops_dedup.shingle_table(ev, "doc_id", "text", 4)
    tr_sh = ops_dedup.shingle_table(tr, "doc_id", "text", 4).select("sh").distinct()
    hits = {r.doc_id: r.n for r in
            ev_sh.join(tr_sh, "sh", "left_semi")
            .groupBy("doc_id").agg(SF.count(SF.lit(1)).alias("n")).collect()}
    n_sh = {r.doc_id: r.n_sh for r in
            ev_sh.select("doc_id", "n_sh").distinct().collect()}
    assert hits[1] == n_sh[1]      # verbatim leak: every shingle hit
    assert 2 not in hits           # disjoint vocab: zero hits


def test_typicality_invariants(spark, sf_dir):
    """rare_rate ∈ [0,1]; avg_bfreq ≥ 1 (every bigram occurs at least
    once — itself); a doc whose bigrams are all corpus-unique must have
    rare_rate 1 and avg_bfreq 1; n_bigrams = token count - 1."""
    from pyspark.sql import functions as F

    from hippo_claim_crossover_spark.plans import ALL_SPECS

    df = ALL_SPECS["q_text_typicality"].fn(spark, sf_dir)
    bad = df.where((F.col("rare_rate") < 0) | (F.col("rare_rate") > 1)
                   | (F.col("avg_bfreq") < 1)).count()
    assert bad == 0
    all_rare = df.where(F.col("rare_rate") == 1.0)
    assert all_rare.where(F.col("avg_bfreq") != 1.0).count() == 0


def test_dq_audit_check_profile(spark, sf_dir):
    """All 8 declared checks report; the synthetic fixtures are clean on
    nulls/domains/keys/orphans by construction, while childless orders
    exist and o_totalprice is independent of the lineitems (so the
    reconciliation check fires) — the audit must reflect exactly that."""
    from hippo_claim_crossover_spark.plans import ALL_SPECS

    rows = {r["check_name"]: r["n_violations"]
            for r in ALL_SPECS["q_dq_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "orders_null_custkey", "orders_status_domain",
        "lineitem_qty_domain", "lineitem_discount_domain",
        "orders_dup_key", "lineitem_orphan", "orders_childless",
        "orders_total_reconcile"}
    clean = ("orders_null_custkey", "orders_status_domain",
             "lineitem_qty_domain", "lineitem_discount_domain",
             "orders_dup_key", "lineitem_orphan")
    assert all(rows[c] == 0 for c in clean), rows
    assert rows["orders_childless"] > 0
    assert rows["orders_total_reconcile"] > 0
