"""§2b tokenizer-training surface: distributed BPE merge-rule induction
over the documents corpus (operators/bpe.py).

The reference has no tokenizer concept (its only string processing is
X12 segment splitting, lib/hippo_claim_crossover.rb:22-38); training a
subword vocabulary is the canonical pre-training corpus job next to
dedup/quality filtering. The oracle replays the identical algorithm as
a DuckDB CTE chain — vocabulary build, per-round weighted pair counts,
deterministic argmax, double-space-delimited merge — so a hash match
proves three full rounds of the iterative algorithm end-to-end (the
same every-iteration proof strategy as q_pagerank / q_cluster_kmeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.bpe import (
    bpe_encoded_vocab,
    bpe_merge_rules,
    bpe_token_counts,
)
from hippo_claim_crossover_spark.plans.base import QuerySpec, t_wide


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merge rules learned from documents.text: one row per
    round (rnd, lhs, rhs, merged, support). See operators/bpe.py for the
    distributed shape (vocab compression, codegen-only rounds, 1-row
    broadcast argmax, checkpointed iteration state)."""
    docs = t_wide(spark, sf_dir, "documents")
    rules = bpe_merge_rules(docs, n_rounds=3)
    return rules.select(
        F.col("round").alias("rnd"),
        F.col("left").alias("lhs"), F.col("right").alias("rhs"),
        "merged", F.col("support").cast("long").alias("support"))


def _pairs_sql(src: str) -> str:
    arr = "string_split(trim(seq), '  ')"
    return f"""
  SELECT pr AS pair, sum(freq) AS pf FROM (
    SELECT freq, unnest(
      CASE WHEN len({arr}) >= 2 THEN
        list_transform(range(1, len({arr})),
                       i -> {arr}[i] || '|' || {arr}[i + 1])
      ELSE [] END) AS pr
    FROM {src})
  GROUP BY pr"""


def _best_sql(src: str) -> str:
    return (f"SELECT split_part(pair, '|', 1) AS l, "
            f"split_part(pair, '|', 2) AS r, pf "
            f"FROM {src} ORDER BY pf DESC, pair LIMIT 1")


def _merge_sql(vocab: str, best: str) -> str:
    return (f"SELECT w, freq, replace(seq, "
            f"' ' || {best}.l || '  ' || {best}.r || ' ', "
            f"' ' || {best}.l || {best}.r || ' ') AS seq "
            f"FROM {vocab}, {best}")


ORACLE_BPE_MERGES = f"""
WITH vocab AS (
  SELECT w, count(*) AS freq,
         '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS seq
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) > 0 GROUP BY w
),
p1 AS ({_pairs_sql("vocab")}),
b1 AS ({_best_sql("p1")}),
v2 AS ({_merge_sql("vocab", "b1")}),
p2 AS ({_pairs_sql("v2")}),
b2 AS ({_best_sql("p2")}),
v3 AS ({_merge_sql("v2", "b2")}),
p3 AS ({_pairs_sql("v3")}),
b3 AS ({_best_sql("p3")})
SELECT 1 AS rnd, l AS lhs, r AS rhs, l || r AS merged,
       CAST(pf AS BIGINT) AS support FROM b1
UNION ALL
SELECT 2, l, r, l || r, CAST(pf AS BIGINT) FROM b2
UNION ALL
SELECT 3, l, r, l || r, CAST(pf AS BIGINT) FROM b3
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE with the learned tokenizer: corpus token counts after the
    3 trained merges, top-20 tokens (vocab-weighted — the corpus itself
    is never re-tokenized; operators/bpe.py bpe_token_counts)."""
    docs = t_wide(spark, sf_dir, "documents")
    counts = bpe_token_counts(docs, n_rounds=3)
    return (counts.orderBy(F.col("n").desc(), "token").limit(20)
            .select("token", F.col("n").cast("long").alias("n")))


# The oracle extends the training chain one merge further (v4 = apply
# b3) and counts freq-weighted tokens — the exact encode definition.
ORACLE_BPE_ENCODE = f"""
WITH vocab AS (
  SELECT w, count(*) AS freq,
         '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS seq
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) > 0 GROUP BY w
),
p1 AS ({_pairs_sql("vocab")}),
b1 AS ({_best_sql("p1")}),
v2 AS ({_merge_sql("vocab", "b1")}),
p2 AS ({_pairs_sql("v2")}),
b2 AS ({_best_sql("p2")}),
v3 AS ({_merge_sql("v2", "b2")}),
p3 AS ({_pairs_sql("v3")}),
b3 AS ({_best_sql("p3")}),
v4 AS ({_merge_sql("v3", "b3")})
SELECT token, CAST(sum(freq) AS BIGINT) AS n
FROM (SELECT freq, unnest(string_split(trim(seq), '  ')) AS token FROM v4)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


def q_tok_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source — the standard tokenizer-quality
    metric (subwords per word; also chars per subword) that multilingual
    LM teams track per language/domain when choosing a vocabulary: a
    high-fertility source pays more sequence length per word.

    Distributed shape: per-(source, word) frequencies from one token
    fan-out; the word→subword-count table comes from the SAME
    vocabulary-compressed BPE encode as q_bpe_encode
    (operators/bpe.bpe_encoded_vocab — merges applied to each distinct
    word once, never a per-doc re-tokenize), joined back on the word
    key (equi-join; the vocabulary side is Zipf-compact and AQE
    broadcasts it when it fits). All outputs are exact integers —
    fertility is reported in integer permille (``n_subwords·1000 div
    n_words``), so no cross-engine float division exists."""
    docs = t_wide(spark, sf_dir, "documents").select("source", "text")
    words = (docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("fs")))
    enc = bpe_encoded_vocab(docs, n_rounds=3).select(
        "w",
        F.size(F.split(F.trim("seq"), "  ")).cast("long").alias("nsub"),
        F.length("w").cast("long").alias("nch"))
    per = (words.join(enc, "w")
           .groupBy("source")
           .agg(F.sum("fs").alias("n_words"),
                F.sum(F.col("fs") * F.col("nsub")).alias("n_subwords"),
                F.sum(F.col("fs") * F.col("nch")).alias("n_chars")))
    return (per.select(
        "source", "n_words", "n_subwords", "n_chars",
        F.expr("n_subwords * 1000 div n_words").alias("fertility_permille"),
        F.expr("n_chars * 1000 div n_subwords")
        .alias("chars_per_subword_permille"))
        .orderBy("source"))


# Same v4 encode chain as ORACLE_BPE_ENCODE, joined to per-source word
# frequencies — fertility falls out in exact integer permille.
ORACLE_TOK_FERTILITY = f"""
WITH vocab AS (
  SELECT w, count(*) AS freq,
         '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS seq
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) > 0 GROUP BY w
),
p1 AS ({_pairs_sql("vocab")}),
b1 AS ({_best_sql("p1")}),
v2 AS ({_merge_sql("vocab", "b1")}),
p2 AS ({_pairs_sql("v2")}),
b2 AS ({_best_sql("p2")}),
v3 AS ({_merge_sql("v2", "b2")}),
p3 AS ({_pairs_sql("v3")}),
b3 AS ({_best_sql("p3")}),
v4 AS ({_merge_sql("v3", "b3")}),
enc AS (
  SELECT w, CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS nsub,
         CAST(length(w) AS BIGINT) AS nch
  FROM v4
), words AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS fs
  FROM (SELECT source,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) > 0 GROUP BY source, w
), per AS (
  SELECT source, CAST(sum(fs) AS BIGINT) AS n_words,
         CAST(sum(fs * nsub) AS BIGINT) AS n_subwords,
         CAST(sum(fs * nch) AS BIGINT) AS n_chars
  FROM words JOIN enc USING (w) GROUP BY source
)
SELECT source, n_words, n_subwords, n_chars,
       n_subwords * 1000 // n_words AS fertility_permille,
       n_chars * 1000 // n_subwords AS chars_per_subword_permille
FROM per ORDER BY source
"""


SPECS: dict[str, QuerySpec] = {
    "q_bpe_merges": QuerySpec(
        q_bpe_merges, ORACLE_BPE_MERGES,
        "distributed BPE merge-rule induction (3 hash-proven rounds)"),
    "q_bpe_encode": QuerySpec(
        q_bpe_encode, ORACLE_BPE_ENCODE,
        "BPE encode: vocab-weighted corpus token counts, top-20"),
    "q_tok_fertility": QuerySpec(
        q_tok_fertility, ORACLE_TOK_FERTILITY,
        "tokenizer fertility per source (subwords/word, chars/subword "
        "in exact integer permille; vocab-compressed encode)"),
}
