"""BPE vocabulary induction: the distributed trainer must match a pure-
Python reference implementation merge-for-merge, and the encoder must
apply the learned ranks exactly like the reference greedy algorithm.
"""

import collections
import random

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    encode_word,
    pair_counts,
    train_bpe,
    word_symbol_counts,
)


def ref_train(word_freqs, num_merges, min_freq=2):
    """Reference BPE (Sennrich et al. 2016, alg. 1) on a word-frequency
    dict, with the operator's deterministic tie-break."""
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if f < min_freq:
            break
        merges.append((l, r, f))
        nxt = collections.Counter()
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nxt[tuple(out)] += c
        vocab = nxt
    return merges


def _freqs(corpus_rows):
    wf = collections.Counter()
    for t in corpus_rows:
        wf.update(t.lower().split())
    return wf


def test_trainer_matches_reference_on_classic_corpus(spark):
    rows = ["low low low low low", "lower lower newest newest",
            "newest newest newest newest widest widest widest"]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    got = train_bpe(df, num_merges=10, min_freq=2)
    assert got == ref_train(_freqs(rows), 10)
    # classic result: 'est</w>' forms within the first few merges
    joined = {l + r for l, r, _ in got}
    assert "es" in joined and "est" in joined


def test_trainer_matches_reference_on_seeded_random_corpora(spark):
    rng = random.Random(42)
    for trial in range(4):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(3, 10))
        ]
        rows = [" ".join(rng.sample(words, rng.randint(1, len(words))))
                for _ in range(4)]
        df = spark.createDataFrame([(t,) for t in rows], "text string")
        got = train_bpe(df, num_merges=6, min_freq=2)
        assert got == ref_train(_freqs(rows), 6), (trial, rows)


def test_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    pc = {
        (r.left, r.right): r.freq
        for r in pair_counts(word_symbol_counts(df)).collect()
    }
    assert pc[("a", "b")] == 3
    assert pc[("b", END_OF_WORD)] == 3
    assert pc[("c", "d")] == 1


def test_encoder_applies_ranks_greedily(spark):
    rows = ["low low low low low", "lowest lowest lower"]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    merges = train_bpe(df, num_merges=8, min_freq=2)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    out = apply_bpe(df, merges).select("bpe_tokens").collect()
    for row, text in zip(out, rows):
        expect = [t for w in text.lower().split() for t in encode_word(w, ranks)]
        assert row.bpe_tokens == expect
    # tokens reassemble the text exactly
    for row, text in zip(out, rows):
        flat = "".join(row.bpe_tokens).replace(END_OF_WORD, " ").strip()
        assert flat == text.lower()


def test_encoder_on_unseen_words_falls_back_to_chars(spark):
    merges = [("l", "o", 5), ("lo", "w", 5)]
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    assert encode_word("low", ranks) == ["low", END_OF_WORD]
    assert encode_word("xyz", ranks) == ["x", "y", "z", END_OF_WORD]


def test_min_freq_stops_training(spark):
    # every word unique -> every pair freq 1 -> zero merges at min_freq=2
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert train_bpe(df, num_merges=5, min_freq=2) == []


def test_null_and_empty_text_rows_are_ignored(spark):
    df = spark.createDataFrame(
        [("low low",), (None,), ("   ",)], "text string"
    )
    merges = train_bpe(df, num_merges=2, min_freq=2)
    assert merges == ref_train({"low": 2}, 2)
    out = apply_bpe(df, merges).select("bpe_tokens").collect()
    assert out[1].bpe_tokens == [] and out[2].bpe_tokens == []


def test_bpe_token_budget_composition(spark):
    """Real-pipeline shape: train BPE, tokenize, then curate to a token
    budget counted in BPE units (not whitespace words) with the
    sorted-cumsum selector — the pieces compose without glue code."""
    from dlt_iceberg_spark.operators.sampling import select_top_tokens

    rows = [
        (1, "low low low low", 0.9),
        (2, "lower lowest low", 0.8),
        (3, "completely unrelated words here", 0.4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, quality double")
    merges = train_bpe(df, num_merges=6, min_freq=2)
    toks = apply_bpe(df, merges).withColumn(
        "n_bpe", F.size(F.col("bpe_tokens")).cast("long")
    )
    n = {r.doc_id: r.n_bpe for r in toks.collect()}
    budget = n[1] + n[2]  # exactly the two best docs
    kept = select_top_tokens(toks, "quality", "n_bpe", budget)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
