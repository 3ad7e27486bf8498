"""BPE trainer tests: the distributed implementation must agree with a
plain-Python reference BPE trainer (classic in-memory algorithm, written
independently of the Spark/SQL string-replace formulation) on the real
fixture corpus — and the string-replace merge must honor BPE's
left-to-right non-overlapping semantics on the adversarial shapes
("abab", "aaa") where a naive delimiter scheme breaks."""

from __future__ import annotations

import re
from collections import Counter

from hippo_claim_crossover_spark.operators.bpe import (
    bpe_merge_rules,
    bpe_token_counts,
)


def _reference_bpe(texts: list[str], n_rounds: int):
    """Textbook BPE: vocab of (symbol tuple → freq), pair counts by
    scanning tuples, merge applied tuple-wise left-to-right."""
    vocab: Counter = Counter()
    for text in texts:
        for w in re.split(r"[^a-z]+", text.lower()):
            if w:
                vocab[tuple(w)] += 1
    rules = []
    for rnd in range(1, n_rounds + 1):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        # argmax with the same tie-break as the engine: count desc, then
        # the "l|r" pair string ascending.
        (best, support) = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}"))
        rules.append((rnd, best[0], best[1], best[0] + best[1], support))
        merged: Counter = Counter()
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and (sym[i], sym[i + 1]) == best):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] += freq
        vocab = merged
    return rules


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    expect = _reference_bpe(texts, 3)
    got = [(r["round"], r["left"], r["right"], r["merged"], r["support"])
           for r in bpe_merge_rules(docs, n_rounds=3)
           .orderBy("round").collect()]
    assert got == expect


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Token counts after 3 merges must equal re-encoding every corpus
    word with the reference trainer's final vocabulary."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    # drive the reference trainer, then count tokens from its final vocab
    vocab: Counter = Counter()
    for text in texts:
        for w in re.split(r"[^a-z]+", text.lower()):
            if w:
                vocab[tuple(w)] += 1
    for rnd, left, right, merged, support in _reference_bpe(texts, 3):
        out_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (left, right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            out_vocab[tuple(out)] += freq
        vocab = out_vocab
    expect: Counter = Counter()
    for sym, freq in vocab.items():
        for tok in sym:
            expect[tok] += freq
    got = {r["token"]: r["n"]
           for r in bpe_token_counts(docs, n_rounds=3).collect()}
    assert got == dict(expect)


def test_bpe_merge_semantics_adversarial(spark):
    """'abab'-shaped words must merge BOTH occurrences in one round;
    'aaa'-shaped words merge left-to-right non-overlapping (2 of the 3
    possible pairs counted, 1 merged)."""
    docs = spark.createDataFrame(
        [("abab",)] * 3 + [("aaa",)] * 2, "text string")
    rules = {r["round"]: r for r in
             bpe_merge_rules(docs, n_rounds=2).collect()}
    expect = _reference_bpe(["abab"] * 3 + ["aaa"] * 2, 2)
    got = [(r, rules[r]["left"], rules[r]["right"], rules[r]["merged"],
            rules[r]["support"]) for r in sorted(rules)]
    assert got == expect
    # round 1: (a,b) appears 2×3=6 times, (a,a) only 2×2=4 ('aaa' has two
    # overlapping pairs, both counted pre-merge), (b,a) 1×3=3.
    assert (rules[1]["left"], rules[1]["right"]) == ("a", "b")
    assert rules[1]["support"] == 6
