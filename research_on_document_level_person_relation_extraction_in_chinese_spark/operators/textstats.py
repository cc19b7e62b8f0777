"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (script/stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (polynomial rolling
hash) — each expressed with built-in ``pyspark.sql.functions`` only, so the
whole stage stays inside whole-stage codegen (no Python in the hot path) and
each has an exact DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: polynomial rolling-hash modulus (fits products in int64: 31 * p < 2^63)
FP_MOD = 1_000_000_007

#: BPE-ish token pattern: letter runs, digit runs, single non-alnum marks
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def lang_id(text: Column) -> Column:
    """Heuristic language ID — CJK-script ratio → zh, else stopword cues.
    Deterministic, SQL-expressible (oracle keeps the identical CASE chain)."""
    cjk = F.length(F.regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    total = F.greatest(F.length(text), F.lit(1))
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return (
        F.when(cjk * 100 > total * 5, "zh")
        .when(padded.contains(" the ") | padded.contains(" and "), "en")
        .when(padded.contains(" der ") | padded.contains(" und "), "de")
        .when(padded.contains(" el ") | padded.contains(" que "), "es")
        .when(padded.contains(" le ") | padded.contains(" pour "), "fr")
        .otherwise("unknown")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: char count, whitespace-token count, mean
    token length, punctuation ratio, and a composite quality score."""
    text = F.col(text_col)
    n_chars = F.length(text)
    tokens = F.split(F.trim(text), "\\s+")
    n_tokens = F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(tokens))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?，。；！？]", ""))
    mean_tok = F.when(n_tokens > 0, (n_chars.cast("double") / n_tokens)).otherwise(0.0)
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), 0.2).otherwise(0.0)
    )
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(mean_tok, 4).alias("q_mean_token_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(score, 4).alias("q_score"),
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via regex extraction (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over UTF-8 code units of the string:
    ``h = (h*31 + codepoint(ch)) mod 1e9+7`` — identical arithmetic is
    reproduced in the DuckDB oracle, so fingerprints compare exactly."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + _codepoint(ch)) % F.lit(FP_MOD),
    )


def _codepoint(ch: Column) -> Column:
    # ascii() in Spark returns the Unicode code point of the first character
    return F.ascii(ch).cast("long")


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition + shape features, per document.

    - ``r_n_words``      whitespace word count
    - ``r_dup_word_frac``  1 − distinct/total words (MassiveText "duplicate
      n-gram fraction" at n=1 — high values flag boilerplate/spam)
    - ``r_top_bigram_frac``  fraction of word bigrams occupied by the single
      most frequent bigram (Gopher's "top 2-gram fraction")
    - ``r_mean_word_len``  mean word length in chars

    Everything is a per-row JVM higher-order-function fold (no explode, no
    shuffle, no Python): the per-doc mode-of-bigrams runs as
    ``aggregate(array_distinct(bg), max(count))`` — O(u·n) per doc on a
    bounded doc length, partition-local, exactly the map-only shape a 100-TB
    quality-filter pass needs. DuckDB oracle mirrors each fold with list
    lambdas (list_distinct/list_filter/list_transform).

    The word and bigram arrays are hoisted to their OWN projected columns:
    Catalyst re-aliases lambda variables per occurrence (no CSE across HOF
    copies), so the embedded form re-ran the split once per consumer and —
    worse — rebuilt the whole bigram array inside the per-distinct-bigram
    count lambda (O(u·n) array BUILDS, not just compares). Identical
    output values; the folds read attributes now.
    """
    words = F.col("_w")
    empty = F.length(F.trim(F.col(text_col))) == 0
    n = F.when(empty, 0).otherwise(F.size(words))
    dup_frac = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(words)).cast("double") / n
    ).otherwise(0.0)
    bigrams = F.col("_bg")
    n_bg = F.size(bigrams)
    top_count = F.aggregate(
        F.array_distinct(bigrams),
        F.lit(0),
        lambda acc, x: F.greatest(acc, F.size(F.filter(bigrams, lambda y: y == x))),
    )
    top_frac = F.when(n_bg > 0, top_count.cast("double") / n_bg).otherwise(0.0)
    total_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_len = F.when(n > 0, total_len.cast("double") / n).otherwise(0.0)
    return (
        df.withColumn("_w", F.split(F.trim(F.col(text_col)), "\\s+"))
        .withColumn(
            "_bg",
            F.zip_with(
                F.slice(words, F.lit(1), F.greatest(n - 1, F.lit(0))),
                F.slice(words, F.lit(2), F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .select(
            "*",
            n.alias("r_n_words"),
            F.round(dup_frac, 6).alias("r_dup_word_frac"),
            F.round(top_frac, 6).alias("r_top_bigram_frac"),
            F.round(mean_len, 6).alias("r_mean_word_len"),
        )
        .drop("_w", "_bg")
    )


def gopher_keep(
    min_words: int = 20,
    max_words: int = 100_000,
    max_dup_word_frac: float = 0.55,
    max_top_bigram_frac: float = 0.07,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
) -> Column:
    """Keep/drop verdict over ``repetition_features`` output (Gopher-style
    rule thresholds re-tuned to the synthetic corpus so both classes are
    populated; on a real crawl use the published constants)."""
    return (
        (F.col("r_n_words") >= min_words)
        & (F.col("r_n_words") <= max_words)
        & (F.col("r_dup_word_frac") <= max_dup_word_frac)
        & (F.col("r_top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("r_mean_word_len") >= min_mean_word_len)
        & (F.col("r_mean_word_len") <= max_mean_word_len)
    )


#: C4's terminal-punctuation set (Raffel et al. 2020 §2.2) plus CJK enders
#: for the zh corpus the reference extracts from.
C4_TERMINALS = ['.', '!', '?', '"', '。', '！', '？', '」']


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line + page filtering (Raffel et al. 2020 §2.2, the cleanup
    that produced C4 from Common Crawl — the same corpus family the
    reference's CCNet pipeline starts from, SURVEY §1.3): keep only lines
    that end in terminal punctuation AND have ≥ ``min_words``
    space-separated words; drop the whole page when fewer than
    ``min_lines`` lines survive, or it mentions ``lorem ipsum``, or it
    contains a curly brace (code). → surviving docs as
    ``(doc_id, text, n_lines_kept, n_lines_orig)`` with ``text`` rebuilt
    from the kept lines.

    Scale shape: one narrow map-only pass — the line logic is a JVM
    ``filter`` HOF over ``split``, no explode, no shuffle, nothing leaves
    whole-stage codegen; at 100 TB this runs at scan speed and is the
    cheapest possible pre-dedup volume cut. Word counting splits on a
    single space (C4 is whitespace-tokenized English; empty tokens from
    runs count equally in the DuckDB oracle, keeping the gate exact).
    """
    keep_line = lambda x: (  # noqa: E731 — HOF lambdas need exact arity
        F.substring(F.trim(x), -1, 1).isin(C4_TERMINALS)
        & (F.size(F.split(F.trim(x), " ", -1)) >= min_words)
    )
    # line array AND surviving-line array hoisted to their own projections
    # (no CSE across HOF copies — see repetition_features): the embedded
    # form ran the per-line filter twice (rebuild + count) and the line
    # split three times per doc. Identical output values.
    lines = F.col("_lines")
    kept = F.col("_kept")
    # page-level rejections must test the ORIGINAL text (a '{' on a dropped
    # line still kills the page), so they are computed before the rebuild
    bad_page = F.lower(F.col(text_col)).contains("lorem ipsum") | F.col(
        text_col
    ).contains("{")
    return (
        df.withColumn("_lines", F.split(F.col(text_col), "\n", -1))
        .withColumn("_kept", F.filter(lines, keep_line))
        .select(
            F.col(id_col).alias("doc_id"),
            F.concat_ws("\n", kept).alias("text"),
            F.size(kept).alias("n_lines_kept"),
            F.size(lines).alias("n_lines_orig"),
            bad_page.alias("_bad"),
        )
        .where((F.col("n_lines_kept") >= min_lines) & ~F.col("_bad"))
        .drop("_bad")
    )


#: full-width ASCII block (U+FF01–FF5E) + ideographic space — the width-fold
#: subset of NFKC that matters for zh web text (full-width punctuation and
#: alphanumerics are pervasive in CJK pages and break tokenizers, dedup
#: shingles, and regex filters keyed on ASCII)
_FULLWIDTH = "".join(chr(0xFF01 + i) for i in range(94)) + "　"
_HALFWIDTH = "".join(chr(0x21 + i) for i in range(94)) + " "


def normalize_width(col: Column) -> Column:
    """Full-width → half-width folding (ＡＢＣ！→ ABC!, 　→ space) as ONE
    JVM ``translate`` — map-only, scan-speed at 100 TB, no Python. Run
    BEFORE tokenization/shingling so width variants of the same text
    collapse (the zh analogue of lowercasing)."""
    return F.translate(col, _FULLWIDTH, _HALFWIDTH)


def fullwidth_char_count(col: Column) -> Column:
    """How many characters width-folding would change (translate with an
    empty replacement deletes, so the length delta counts them)."""
    return (F.length(col) - F.length(F.translate(col, _FULLWIDTH, ""))).cast("long")
