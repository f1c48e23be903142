"""Text analysis operators: token stats, quality scoring, language ID,
rolling-hash fingerprints.  All whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.util import fan_out

#: tiny per-language stopword profiles for the n-gram/stopword-vote heuristic.
#: Deterministic and dependency-free; real pipelines would swap in fastText.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "y", "es", "una"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

DEFAULT_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), r"\s+")


def _reserve_temp_cols(df: DataFrame, *names: str) -> None:
    """Fail loudly when a staging column name already exists in the input
    (ADVICE r11): withColumn would silently CLOBBER the user's column —
    gopher_rules' selectExpr(*df.columns) would then return the n-gram
    array under the user's column name, and the drop() at the end of the
    other operators would delete the user's data."""
    clashes = [n for n in names if n in df.columns]
    if clashes:
        raise ValueError(
            f"input already has column(s) {clashes} — these names are "
            "reserved as operator staging columns; rename them first"
        )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword counts per row."""
    toks = _tokens(text_col)
    # BPE-ish proxy: alnum runs + punctuation as separate tokens
    bpe_ish = F.expr(rf"regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]', 0)")
    return df.withColumns(
        {
            "n_tokens_ws": F.size(toks).cast("long"),
            "n_tokens_bpe": F.size(bpe_ish).cast("long"),
            "n_chars": F.length(text_col).cast("long"),
        }
    )


def quality_score(
    df: DataFrame, text_col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> DataFrame:
    """Heuristic quality features + one blended score in [0,1]:
    length band, mean word length band, stopword presence, alpha ratio.
    (The blend mirrors C4/Gopher-style filter features.)"""
    # PERF: materialize the token array once — inline, the split() is
    # pasted into every n_tok/stop_ratio/mean_word_len reference
    # (~12 evals/row); size() over the materialized column is O(1)
    _reserve_temp_cols(df, "_qs_toks")
    toks = F.col("_qs_toks")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    mean_word_len = (n_chars - (n_tok - 1)) / n_tok
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), 0.25).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.25).otherwise(0.0)
        + F.when(alpha_chars / F.greatest(n_chars, F.lit(1.0)) > 0.6, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("_qs_toks", _tokens(text_col))
        .withColumns(
            {
                "n_tokens": n_tok.cast("long"),
                "mean_word_len": mean_word_len,
                "stopword_ratio": stop_ratio,
                "alpha_ratio": alpha_chars / F.greatest(n_chars, F.lit(1.0)),
                "quality_score": score,
            }
        )
        .drop("_qs_toks")
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition features: repeated content is the strongest
    single signal of low-quality web text (boilerplate, SEO spam, scraper
    loops — Rae et al. 2021 §A1.1 use exactly these thresholds).

    Adds, per row (pure expressions, map-side, no shuffle):

    - ``distinct_token_ratio``  — |distinct tokens| / |tokens|;
    - ``top_token_ratio``       — occurrences of the most frequent token /
      |tokens| (Gopher rejects > 0.2 for stopword-like floods);
    - ``dup_bigram_ratio``      — 1 − |distinct bigrams| / |bigrams|
      (repeated phrasing; Gopher rejects high fractions).
    """
    # PERF: materialize the token and bigram arrays as intermediate
    # columns — as inline expressions they are textually pasted into every
    # consumer (split() ~10 evals/row, the bigram zip_with 3), and
    # CollapseProject keeps non-cheap exprs referenced >1x in their own
    # projection, so each array is built once per row.
    _reserve_temp_cols(df, "_t", "_bg")
    toks = F.col("_t")
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    # PERF: never index an array expression from inside a lambda —
    # ``element_at(sort_array(toks), i)`` re-sorts per ELEMENT (interpreted
    # higher-order functions re-evaluate captured expressions at every
    # reference), turning an O(n log n) row into O(n² log n).  Iterate the
    # sorted array's own elements instead: sort_array is an aggregate
    # ARGUMENT, evaluated once per row.
    top_run = F.aggregate(
        F.sort_array(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # bigrams via zip_with over two slices (each computed once), not
    # per-index element_at
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws("\x1f", a, b),
        )
    )
    n_bi = F.size(F.col("_bg")).cast("double")
    dup_bigram = F.when(
        n_bi < 1, F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.size(F.array_distinct(F.col("_bg"))) / n_bi)
    return (
        df.withColumn("_t", _tokens(text_col))
        .withColumn("_bg", bigrams)
        .withColumns(
            {
                "distinct_token_ratio": distinct_ratio,
                "top_token_ratio": top_run.cast("double") / n,
                "dup_bigram_ratio": dup_bigram,
            }
        )
        .drop("_t", "_bg")
    )


#: Gopher quality-rule thresholds (Rae et al. 2021, Appendix A1.1) —
#: (feature, op, bound); a document is kept when EVERY rule holds.
GOPHER_THRESHOLDS: tuple[tuple[str, str, float], ...] = (
    ("n_words", ">=", 50),
    ("n_words", "<=", 100_000),
    ("mean_word_len", ">=", 3.0),
    ("mean_word_len", "<=", 10.0),
    ("symbol_word_ratio", "<=", 0.1),
    ("bullet_line_frac", "<=", 0.9),
    ("ellipsis_line_frac", "<=", 0.3),
    ("alpha_word_frac", ">=", 0.8),
    ("req_stopword_count", ">=", 2),
    ("dup_line_frac", "<=", 0.30),
    ("dup_para_frac", "<=", 0.30),
    ("dup_line_char_frac", "<=", 0.20),
    ("dup_para_char_frac", "<=", 0.20),
    ("top_2gram_char_frac", "<=", 0.20),
    ("top_3gram_char_frac", "<=", 0.18),
    ("top_4gram_char_frac", "<=", 0.16),
    ("dup_5gram_char_frac", "<=", 0.15),
    ("dup_6gram_char_frac", "<=", 0.14),
    ("dup_7gram_char_frac", "<=", 0.13),
    ("dup_8gram_char_frac", "<=", 0.12),
    ("dup_9gram_char_frac", "<=", 0.11),
    ("dup_10gram_char_frac", "<=", 0.10),
)

#: the 8 "required stopwords" of the Gopher word-presence rule
GOPHER_REQ_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _sorted_dup_chars_sql(arr: str) -> str:
    """Characters inside values occurring ≥ 2 times in array ``arr``
    (counting every occurrence), as ONE fold over the sorted array
    tracking (prev, run length, chars): a run's 2nd element adds 2×len
    (itself plus the 1st, retroactively), later elements add len each —
    Σ = count·len per duplicated value.  A single aggregate beats the
    shifted-zip_with dup-mark formulation ~3× (it materialized five
    intermediate arrays per family; bench-profiled)."""
    d = f"sort_array({arr})"
    return (
        f"CASE WHEN size({arr}) >= 2 THEN "
        f"aggregate({d}, "
        f"struct(CAST(NULL AS STRING) AS prev, 1 AS run, 0L AS chars), "
        f"(acc, x) -> struct(x AS prev, "
        f"IF(x <=> acc.prev, acc.run + 1, 1) AS run, "
        f"acc.chars + CASE WHEN x <=> acc.prev "
        f"THEN CAST(length(x) AS BIGINT) * IF(acc.run = 1, 2, 1) "
        f"ELSE 0L END AS chars), "
        f"acc -> acc.chars) ELSE 0L END"
    )


def _top_run_chars_sql(arr: str) -> str:
    """Characters covered by the most frequent value of array ``arr``
    (occurrences × value length), via one pass over the sorted array."""
    d = f"sort_array({arr})"
    return (
        f"aggregate({d}, "
        f"struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0L AS best), "
        f"(acc, x) -> struct(x AS prev, "
        f"IF(x <=> acc.prev, acc.run + 1, 1) AS run, "
        f"greatest(acc.best, CAST(IF(x <=> acc.prev, acc.run + 1, 1) AS BIGINT) "
        f"* length(x)) AS best), "
        f"acc -> acc.best)"
    )


def _ngrams_sql(n: int) -> str:
    """Space-joined word n-grams over the bound token column ``_t``."""
    return (
        f"CASE WHEN size(_t) >= {n} THEN "
        f"transform(sequence(1, size(_t) - {n} + 1), i -> concat_ws(' ', slice(_t, i, {n}))) "
        f"ELSE array() END"
    )


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The COMPLETE Gopher/MassiveText quality-rule matrix (Rae et al.
    2021, Appendix A1.1) as pure map-side expressions — per document:
    word-count band, mean word length band, symbol-to-word ratio
    ('#'/'...'/'…'), bullet- and ellipsis-line fractions, alphabetic-word
    fraction, required-stopword presence, duplicate line/paragraph count
    and CHARACTER fractions, top-{2,3,4}-gram character fractions, and
    duplicate-{5..10}-gram character fractions, plus ``gopher_keep`` =
    conjunction of every threshold (GOPHER_THRESHOLDS).

    Formula conventions (documented because published reproductions vary):
    character fractions use the raw document length as denominator; the
    duplicate-n-gram fraction counts EVERY occurrence of a duplicated
    n-gram (overlaps not deduplicated); n-gram character length includes
    the joining spaces.  Every formula is exact count arithmetic, so a SQL
    oracle replays the whole matrix bit-for-bit.

    Scale shape: zero shuffles, zero UDFs — one projection whose
    higher-order functions are linear in document length (slice-shifted
    zip_with, never per-index element_at).
    """
    _reserve_temp_cols(
        df, "_t", "_lines", "_paras", *[f"_g{n}" for n in range(2, 11)]
    )
    toks = rf"filter(split({text_col}, '\\s+'), x -> x <> '')"
    base = fan_out(df).withColumns(
        {
            "_t": F.expr(toks),
            "_lines": F.expr(rf"filter(split({text_col}, '\\n'), x -> x <> '')"),
            "_paras": F.expr(rf"filter(split({text_col}, '\\n\\n'), x -> x <> '')"),
        }
    )
    # materialize each n-gram array ONCE as a column: _sorted_dup_chars_sql
    # references its argument twice (size guard + sort_array), and pasting
    # _ngrams_sql(n) in textually made every doc build each gram array
    # twice — the dominant per-doc cost (string concat is O(n·doc_chars)
    # per family).  A column reference keeps one build; CollapseProject
    # leaves non-cheap exprs referenced >1x in their own projection.
    base = base.withColumns(
        {f"_g{n}": F.expr(_ngrams_sql(n)) for n in range(2, 11)}
    )

    def _cnt(lit: str, width: int) -> str:
        esc = lit.replace("'", "\\'")
        return f"(length({text_col}) - length(replace({text_col}, '{esc}', ''))) / {width}"

    nw = "CAST(size(_t) AS DOUBLE)"
    total_chars = f"CAST(greatest(length({text_col}), 1) AS DOUBLE)"
    feature_sql: dict[str, str] = {
        "n_words": "size(_t)",
        "mean_word_len": f"aggregate(_t, 0L, (a, x) -> a + length(x)) / greatest({nw}, 1.0)",
        "symbol_word_ratio": f"({_cnt('#', 1)} + {_cnt('...', 3)} + {_cnt('…', 1)}) / greatest({nw}, 1.0)",
        "bullet_line_frac": (
            "size(filter(_lines, l -> substring(ltrim(l), 1, 1) IN ('-', '*', '•'))) "
            "/ CAST(greatest(size(_lines), 1) AS DOUBLE)"
        ),
        "ellipsis_line_frac": (
            "size(filter(_lines, l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…')) "
            "/ CAST(greatest(size(_lines), 1) AS DOUBLE)"
        ),
        "alpha_word_frac": (
            f"size(filter(_t, x -> x RLIKE '[A-Za-z]')) / greatest({nw}, 1.0)"
        ),
        "req_stopword_count": (
            "size(array_intersect(array_distinct(_t), array("
            + ", ".join(f"'{w}'" for w in GOPHER_REQ_STOPWORDS)
            + ")))"
        ),
        "dup_line_frac": (
            "1.0 - size(array_distinct(_lines)) / CAST(greatest(size(_lines), 1) AS DOUBLE)"
        ),
        "dup_para_frac": (
            "1.0 - size(array_distinct(_paras)) / CAST(greatest(size(_paras), 1) AS DOUBLE)"
        ),
        "dup_line_char_frac": f"{_sorted_dup_chars_sql('_lines')} / {total_chars}",
        "dup_para_char_frac": f"{_sorted_dup_chars_sql('_paras')} / {total_chars}",
    }
    for n in (2, 3, 4):
        feature_sql[f"top_{n}gram_char_frac"] = (
            f"{_top_run_chars_sql(f'_g{n}')} / {total_chars}"
        )
    for n in (5, 6, 7, 8, 9, 10):
        feature_sql[f"dup_{n}gram_char_frac"] = (
            f"{_sorted_dup_chars_sql(f'_g{n}')} / {total_chars}"
        )
    out = base.selectExpr(
        *df.columns, *[f"{sql} AS {name}" for name, sql in feature_sql.items()]
    )
    keep = F.lit(True)
    for feat, op, bound in GOPHER_THRESHOLDS:
        c = F.col(feat)
        keep = keep & (c >= bound if op == ">=" else c <= bound)
    return out.withColumn("gopher_keep", keep)


def c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020 §2.2)
    as map-side expressions — the other canonical web-corpus filter next to
    :func:`gopher_rules`:

    - a LINE is retained iff it ends in terminal punctuation
      (``. ! ? "``), has ≥ 5 words, and does not contain "javascript"
      (case-insensitive);
    - a PAGE is dropped when it contains a curly brace (code), contains
      "lorem ipsum" (boilerplate), or retains fewer than 3 lines (the
      paper's three-sentence minimum, lines standing in for sentences as
      in the open reproductions).

    Adds ``cleaned_text`` (the retained lines re-joined — the column a
    pipeline feeds downstream), ``n_lines_total``/``n_lines_kept``,
    ``has_curly``/``has_lorem_ipsum``, and ``c4_keep``.  Zero shuffles,
    zero UDFs; O(doc length) per row.
    """
    kept = (
        rf"filter(split({text_col}, '\\n'), l -> "
        r"substring(rtrim(l), -1, 1) IN ('.', '!', '?', '\"') "
        r"AND size(filter(split(l, '\\s+'), w -> w <> '')) >= 5 "
        r"AND NOT contains(lower(l), 'javascript'))"
    )
    out = fan_out(df).withColumns(
        {
            "_kept": F.expr(kept),
            "n_lines_total": F.expr(
                rf"size(filter(split({text_col}, '\\n'), l -> l <> ''))"
            ).cast("long"),
            "has_curly": F.expr(f"contains({text_col}, '{{') OR contains({text_col}, '}}')"),
            "has_lorem_ipsum": F.expr(f"contains(lower({text_col}), 'lorem ipsum')"),
        }
    )
    return (
        out.withColumns(
            {
                "cleaned_text": F.array_join("_kept", "\n"),
                "n_lines_kept": F.size("_kept").cast("long"),
            }
        )
        .withColumn(
            "c4_keep",
            (F.col("n_lines_kept") >= 3)
            & ~F.col("has_curly")
            & ~F.col("has_lorem_ipsum"),
        )
        .drop("_kept")
    )


def language_id(
    df: DataFrame, text_col: str = "text", markers: dict[str, list[str]] | None = None
) -> DataFrame:
    """Stopword-vote language ID: score each language by marker-token hits
    per token; argmax wins (ties → lexicographic, deterministic).

    Pure expression plan: one pass over the token array per language —
    no shuffle, no UDF."""
    markers = markers or LANG_MARKERS
    # PERF: materialize the distinct-token array and the ranked score
    # array as intermediate columns.  Inline, `toks` is pasted into every
    # language's array_intersect and the whole ranked sort_array is pasted
    # into each of the 3 output references (when-guard, lang, score) —
    # ~3 x n_langs split+distinct+intersect evaluations per row.  As
    # columns each is built once (CollapseProject keeps non-cheap exprs
    # referenced >1x in their own projection).
    _reserve_temp_cols(df, "_lid_toks", "_lid_ranked")
    toks = F.col("_lid_toks")
    scores = []
    for lang, words in sorted(markers.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                (F.size(F.array_intersect(toks, arr)) / F.lit(len(words))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax: sort by (score desc, lang asc) via array_max on (score, -lang)…
    # struct ordering compares fields in order, so invert: max of (score, lang)
    # picks lexicographically-last on ties; flip by sorting ascending on
    # (-score, lang) and taking element 1.
    ranked = F.sort_array(
        F.array(
            *[
                F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang"), s["score"].alias("score"))
                for s in scores
            ]
        )
    )
    best = F.col("_lid_ranked")[0]
    return (
        df.withColumn("_lid_toks", F.array_distinct(_tokens(text_col)))
        .withColumn("_lid_ranked", ranked)
        .withColumns(
            {
                "lang_pred": F.when(best["score"] > 0, best["lang"]).otherwise(
                    F.lit("und")
                ),
                "lang_score": best["score"],
            }
        )
        .drop("_lid_toks", "_lid_ranked")
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    window: int = 8,
    keep_mod: int = 16,
    hash_mode: str = "xx",
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every ``window``-token
    shingle, keep hashes ≡ 0 (mod keep_mod), fingerprint = xxhash of the
    kept set.  Robust to local edits (content-defined sampling).

    ``hash_mode='xx'`` (production) hashes tokens with xxhash64 and digests
    the kept set with xxhash64 (a long).  ``hash_mode='md5'`` is the
    cross-engine verification path: tokens hash to the top 60 bits of md5
    (reproducible in DuckDB as ``('0x' || substr(md5(t), 1, 15))::BIGINT``)
    and the fingerprint is the md5 hex digest of the sorted kept set — every
    step pure arithmetic/md5 so an independent engine can replay it exactly.

    Tokens are hashed to longs once per row (a projection barrier keeps it
    single-pass); each window hash is then a polynomial fold over a slice of
    the long array — pure integer arithmetic per position instead of
    re-slicing and re-concatenating strings, which cuts the per-row cost
    from O(n·window·token_len) string work to O(n·window) long ops."""

    # Mersenne-prime modular fold: acc stays < 2^31 so acc*m + h' never
    # overflows a long (ANSI mode makes overflow an error, not a wrap)
    p = F.lit(2_147_483_647).cast("long")

    def _poly(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, h: F.pmod(acc * F.lit(1_000_003) + F.pmod(h, p), p),
        )

    if hash_mode == "xx":
        def tok_hash(t):
            return F.xxhash64(t)
    elif hash_mode == "md5":
        def tok_hash(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r} (expected 'xx' or 'md5')")

    _reserve_temp_cols(df, "_th")
    staged = fan_out(df).withColumn("_th", F.transform(_tokens(text_col), tok_hash))
    th = F.col("_th")
    n = F.size(th)
    shingle_hashes = F.when(n < window, F.array(_poly(th))).otherwise(
        F.transform(F.sequence(F.lit(0), n - window), lambda i: _poly(F.slice(th, i + 1, window)))
    )
    kept = F.filter(shingle_hashes, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)
    joined = F.concat_ws(",", F.transform(F.sort_array(kept), lambda h: h.cast("string")))
    fingerprint = F.xxhash64(joined) if hash_mode == "xx" else F.md5(joined)
    return staged.withColumns(
        {
            "fingerprint": fingerprint,
            "n_anchors": F.size(kept).cast("long"),
        }
    ).drop("_th")


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-tokenization step for context-window training data.

    Chunks start at 0, stride, 2*stride, ...; each takes up to
    ``chunk_tokens`` tokens; documents at most ``chunk_tokens`` long yield
    one chunk.  The chunk array builds map-side inside one projection and
    ``posexplode`` fans it out — no shuffle, no UDF, and output row count
    is ~n_tokens/stride per doc regardless of document skew (one giant doc
    becomes many rows, not one giant row).

    Returns (id, chunk_id, chunk_text, n_chunk_tokens).
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens between chunks")
    # PERF: tokenize ONCE into a projection attribute.  Referencing the
    # split(...) EXPRESSION from inside the transform lambda re-tokenizes
    # the whole document per chunk — O(n²/stride) per row, 2 minutes for a
    # single 200k-token doc.  As a projected column it is computed once per
    # row and the lambda's slice() is plain array indexing; CollapseProject
    # keeps multi-referenced expensive expressions materialized.
    staged = fan_out(df).select(F.col(id_col), _tokens(text_col).alias("_toks"))
    tk = F.col("_toks")
    n = F.size(tk)
    # number of windows covering all tokens: 1 + ceil((n - chunk)/stride),
    # in integer arithmetic (float ceil drifts across engines)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.expr(
            f"(size(_toks) - {chunk_tokens} + {stride} - 1) div {stride}"
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(tk, i * stride + 1, chunk_tokens)),
    )
    out = staged.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.withColumn(
        "n_chunk_tokens", F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long")
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Cross-corpus line deduplication (RefinedWeb / CCNet boilerplate
    removal): drop every line that occurs in at least ``min_docs``
    DISTINCT documents — navigation chrome, cookie banners, and license
    footers repeat across a crawl while real prose doesn't — then
    reassemble each document from its surviving lines in order.

    Plan shape: posexplode to (doc, pos, line); the per-line document
    frequency is a two-stage aggregate (distinct (line, doc) first, then
    count) so hot boilerplate lines partial-aggregate map-side instead of
    funnelling raw occurrence rows into one reducer; the boilerplate set
    joins back keyed by line; reassembly is one doc-keyed aggregate over
    ``array_sort(struct(pos, line))`` — no window, no UDF.  A document
    whose every line is boilerplate survives with empty text (the row is
    kept so downstream joins don't silently lose doc ids).

    Returns (id, text, n_kept, n_removed).
    """
    if min_docs < 2:
        raise ValueError("min_docs < 2 would delete every line")
    lines = fan_out(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("pos", "line"),
    )
    freq = (
        lines.select("line", id_col)
        .dropDuplicates(["line", id_col])
        .groupBy("line")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("line")
    )
    tagged = lines.join(freq.withColumn("_dup", F.lit(1)), "line", "left")
    rebuilt = tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_dup").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            sep,
        ).alias(text_col),
        F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("_dup").isNull(), 0).otherwise(1))
        .cast("long")
        .alias("n_removed"),
    )
    return rebuilt


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    shingle_k: int = 5,
) -> DataFrame:
    """Benchmark-contamination detection: flag documents sharing any
    ``shingle_k``-gram with the probe corpus (eval/test sets must not leak
    into training data).

    Probe shingle hashes are tiny next to the corpus, so the plan is
    shingle-explode the docs map-side → semi-join the (broadcast) probe
    hash set → distinct doc ids; the corpus never shuffles its text, only
    candidate doc ids.  Returns (id, n_hits) per CONTAMINATED doc.
    """
    from dlt_iceberg_spark.operators.dedup import shingles_of

    ptc = probe_text_col or text_col
    # tokenize into an attribute FIRST so the shingle lambda slices an
    # array instead of re-splitting the text per shingle (O(n²) per row on
    # long documents)
    probe_hashes = (
        probes.select(_tokens(ptc).alias("_toks"))
        .select(
            F.explode(F.array_distinct(shingles_of(F.col("_toks"), shingle_k))).alias("s")
        )
        .select(F.xxhash64("s").alias("sh"))
        .distinct()
    )
    doc_shingles = (
        fan_out(docs)
        .select(F.col(id_col), _tokens(text_col).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles_of(F.col("_toks"), shingle_k))).alias("s"),
        )
        .select(id_col, F.xxhash64("s").alias("sh"))
    )
    return (
        doc_shingles.join(F.broadcast(probe_hashes), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


#: RE2-safe patterns (no backreferences/lookarounds) so the SAME regex runs
#: on Spark (Java regex) and DuckDB (RE2) — required for oracle parity.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Scrub PII-shaped spans, replacing each with ``<KIND>`` tokens, and
    count the redactions per kind — the standard pre-training scrub pass.

    Pure ``regexp_replace``/``regexp_count`` expressions: map-side, no
    shuffle, whole-stage codegen; patterns are RE2-safe so the DuckDB
    oracle applies the identical regexes.  Adds ``text_redacted`` and one
    ``n_<kind>`` column per pattern.
    """
    pats = patterns or PII_PATTERNS
    out = F.col(text_col)
    cols = {}
    # count-then-replace SEQUENTIALLY: each kind is counted on the text as
    # already redacted by earlier kinds, so overlapping patterns never
    # double-count a span
    for kind, pat in pats.items():
        cols[f"n_{kind}"] = F.regexp_count(out, F.lit(pat)).cast("long")
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    cols["text_redacted"] = out
    return df.withColumns(cols)
