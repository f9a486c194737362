"""Rule-based document quality filtering (C4 / Gopher style).

The cheap first pass of every corpus pipeline: drop documents failing
hard structural rules BEFORE any expensive dedup / model scoring touches
them.  Rules follow the published C4 (Raffel et al.) and Gopher (Rae et
al.) recipes adapted to whitespace text: word-count bounds, mean word
length, alphabetic-word fraction, symbol ratio, URL/email density — plus
a BPE-ish regex token count (letter runs / single digits / single
symbols), the standard pre-tokenizer shape, as the budget currency.

Everything is a built-in JVM expression (regexp / higher-order array
functions): map-only, no shuffle, no Python — at 100 TB this pass is
scan-bound, exactly as it should be.  Regex patterns use only literal
character classes so Java regex (Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["BPE_ISH", "URL_RE", "EMAIL_RE", "rule_signals", "rule_filter"]

# letter runs | single digits | single non-space symbols — the GPT-2-ish
# pre-tokenizer shape reduced to classes both regex engines treat alike
BPE_ISH = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
URL_RE = "https?://[^ ]+"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))\
        .cast("long")


def rule_signals(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document structural signals; all ratios are single divisions
    of exact integers (engine bit parity)."""
    toks = tokens_col(F.col(text_col)).alias("_t")
    base = docs.select(F.col(id_col), F.col(text_col), toks)
    t = F.col("_t")
    n_words = F.size(t).cast("long")
    word_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("^[a-z]+$")))\
        .cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    symbol_chars = F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))\
        .cast("long")
    # 0/0 is NULL in Spark (tri-state poison: ~keep / keep == False
    # filters then disagree with filter(keep), ADVICE r3) — an
    # empty/whitespace-only doc gets ratio 0.0 and a definite verdict
    def _frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den.cast("double"))\
            .otherwise(F.lit(0.0))

    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        _frac(word_chars, n_words).alias("mean_word_len"),
        n_alpha.alias("n_alpha_words"),
        _frac(n_alpha, n_words).alias("alpha_frac"),
        symbol_chars.alias("symbol_chars"),
        _frac(symbol_chars, n_chars).alias("symbol_frac"),
        _count(F.col(text_col), URL_RE).alias("n_urls"),
        _count(F.col(text_col), EMAIL_RE).alias("n_emails"),
        _count(F.col(text_col), BPE_ISH).alias("n_bpe_tokens"),
    )


def rule_filter(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_words: int = 5,
                max_words: int = 100_000,
                min_mean_word_len: float = 2.0,
                max_mean_word_len: float = 12.0,
                min_alpha_frac: float = 0.6,
                max_symbol_frac: float = 0.2) -> DataFrame:
    """Signals plus the Gopher-style ``keep`` verdict.  Thresholds are the
    published defaults scaled to whitespace tokens; tune per corpus."""
    s = rule_signals(docs, text_col, id_col)
    keep = ((F.col("n_words") >= F.lit(int(min_words)))
            & (F.col("n_words") <= F.lit(int(max_words)))
            & (F.col("mean_word_len") >= F.lit(float(min_mean_word_len)))
            & (F.col("mean_word_len") <= F.lit(float(max_mean_word_len)))
            & (F.col("alpha_frac") >= F.lit(float(min_alpha_frac)))
            & (F.col("symbol_frac") <= F.lit(float(max_symbol_frac))))
    # the verdict is always a definite boolean (never NULL)
    return s.withColumn("keep", F.coalesce(keep, F.lit(False)))
