"""Distributed BPE vocabulary induction (Sennrich et al. 2016) and
subword encoding — the tokenizer-training step of an LLM data pipeline.

The trick that makes BPE tractable at 100 TB is the classic one: training
never touches the corpus after ONE aggregation.  Pass 1 collapses the
corpus to its distinct-word frequency table (one shuffle; |vocab| rows,
millions at worst — independent of corpus row count).  Every merge
iteration then runs on that compact table: count adjacent symbol pairs
weighted by word frequency (map-side explode + one small agg), take the
argmax (an O(1)-output job), and fold the winning pair into each word's
symbol array with a JVM-side ``aggregate`` lambda — no UDFs, no driver
materialization of the vocabulary.  Lineage is truncated per round with
``localCheckpoint`` (same pattern as ``operators/graph.py``), so K merges
are K bounded jobs, not one K-deep plan.

Encoding (``apply_bpe``) is the one place Python runs: greedy
rank-ordered merging per word is inherently sequential, so it ships the
learned ranks to executors and encodes via an Arrow-batched pandas UDF
with a per-batch word cache — the standard fast path for token-level
loops Spark expressions cannot express.

The merge list itself is driver-sized by construction (``num_merges``
entries — 32k for a real tokenizer), never the vocabulary.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: end-of-word sentinel appended to each word's symbol sequence, so merges
#: never cross word boundaries and word-final units stay distinct (the
#: original BPE formulation's '</w>')
END_OF_WORD = "</w>"
#: separator inside a serialized pair (never appears in text tokens)
_SEP = "\x00"


def word_symbol_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    marker: str = END_OF_WORD,
) -> DataFrame:
    """Distinct-word frequency table: ``word``, ``count``, ``symbols``
    (character array + end-of-word marker).  The ONLY corpus-sized job in
    BPE training — everything after runs on |distinct words| rows."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = df.select(
        F.explode(F.split(F.trim(text), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn(
            "symbols",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(marker))),
        )
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the word table, weighted by
    word count: ``left``, ``right``, ``freq``.  Map-side explode of
    ``zip_with(symbols[:-1], symbols[1:])`` + one aggregation — the inner
    loop of every merge iteration."""
    pairs = F.zip_with(
        F.expr("slice(symbols, 1, size(symbols) - 1)"),
        F.expr("slice(symbols, 2, size(symbols) - 1)"),
        lambda a, b: F.concat(a, F.lit(_SEP), b),
    )
    return (
        words.select(F.explode(pairs).alias("pair"), "count")
        .groupBy("pair")
        .agg(F.sum("count").alias("freq"))
        .select(
            F.split_part(F.col("pair"), F.lit(_SEP), F.lit(1)).alias("left"),
            F.split_part(F.col("pair"), F.lit(_SEP), F.lit(2)).alias("right"),
            "freq",
        )
    )


def merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right fold of one merge into a symbol array —
    JVM-side ``aggregate``, no UDF.  ``[a,a,a]`` with merge (a,a) becomes
    ``[aa,a]``, exactly reference BPE's scan order."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from a corpus.

    Returns ``[(left, right, pair_freq), ...]`` in merge order — the
    tokenizer artifact, inherently driver-sized (one row per merge).
    Ties break deterministically on (freq desc, left asc, right asc), so
    reruns and engines agree.  Stops early when the best pair's frequency
    drops below ``min_freq``.
    """
    words = word_symbol_counts(df, text_col, lowercase=lowercase).select(
        "count", "symbols"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            top = (
                pair_counts(words)
                .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top or top[0].freq < min_freq:
                break
            left, right, freq = top[0].left, top[0].right, int(top[0].freq)
            merges.append((left, right, freq))
            prev = words
            words = words.withColumn(
                "symbols", merge_pair(F.col("symbols"), left, right)
            ).localCheckpoint(eager=True)
            prev.unpersist()
    finally:
        words.unpersist()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                marker: str = END_OF_WORD) -> list[str]:
    """Reference greedy encoder: repeatedly merge the LOWEST-RANK adjacent
    pair present (the exact algorithm of the original subword-nmt / GPT-2
    encoders).  Used per-word inside the pandas UDF and by tests."""
    syms = list(word) + [marker]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        _, i = best
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: Iterable[tuple[str, str, int]] | Iterable[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: appends ``out_col``
    (``array<string>`` of subword units).  Ranks broadcast inside the
    serialized UDF closure; per-batch word cache collapses the Zipfian
    head, so the Python loop runs roughly once per DISTINCT word per
    batch."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @pandas_udf("array<array<string>>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            words = text.lower().split() if lowercase else text.split()
            out = []
            for w in words:
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.append(toks)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, F.flatten(_encode(F.col(text_col))))
