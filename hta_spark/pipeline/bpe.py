"""BPE merge training — the tokenizer-construction stage of an LLM data
pipeline (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units").

The classic algorithm iterates: count adjacent symbol pairs over the
corpus, merge the most frequent pair everywhere, repeat K times; the
ordered merge list IS the tokenizer.  The standard scaling trick applies
unchanged here: merges operate on the *distinct-word* table weighted by
word frequency, never on the corpus itself — so every round is one
map-side-combined aggregate over vocabulary-sized data (the corpus is
scanned exactly once, up front, to build the weighted vocab).

Spark-first shape per round (driver loop of K rounds, like
:mod:`.kmeans`):

- pair counts: explode each word's adjacent symbol pairs (higher-order
  ``transform`` over an index sequence — JVM-side, no UDF), weighted
  grouped sum;
- top pair: ``orderBy(count desc, pair asc).limit(1)`` —
  TakeOrderedAndProject, never a global sort;
- merge: symbols live as a space-separated, space-padded string
  (`` h e l l o ``), so merging pair (l, r) is a literal
  ``replace(' l r ', ' lr ')`` — map-only, whole-stage codegen.

Merge-application semantics (DOCUMENTED DEVIATION): literal replace
scans left-to-right non-overlapping and consumes the trailing separator,
so a run of repeated symbols (``l == r``) merges one pair per
application rather than every alternate pair in one pass.  Each round
applies the replace exactly ``MERGE_PASSES`` (2) times, which resolves
runs up to length 5 like canonical greedy BPE; longer same-symbol runs
(rare in natural text) may defer some merges to a later round where the
same pair wins again.  The semantics are exactly reproducible in any
engine with leftmost non-overlapping ``replace`` — the property the
DuckDB oracle gate needs — unlike canonical run-parity merging, whose
per-run alternation has no portable declarative form.

Reference parity note: the reference engine (metricq/hta) has no
tokenizer surface; this extends the pipeline family per the build brief
(VERDICT r3 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["MERGE_PASSES", "weighted_vocab", "symbolize",
           "symbolize_col", "chain_merges", "pair_counts",
           "apply_merge", "bpe_train", "bpe_segment_counts"]

#: literal-replace applications per merge round (see module docstring)
MERGE_PASSES = 2


def weighted_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, freq) over the corpus — the one corpus-sized scan.
    Empty tokens (consecutive separators) are dropped."""
    return (docs.select(F.explode(tokens_col(F.col(text_col)))
                        .alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("freq")))


def symbolize_col(token=None):
    """Space-padded symbol string of a token column:
    ``"abc" -> " a b c "`` (every symbol surrounded by single spaces, the
    invariant every merge preserves) — the ONE definition shared by
    training and segmentation."""
    token = token if token is not None else F.col("token")
    return F.concat(F.lit(" "), F.regexp_replace(token, "(.)", "$1 "))


def symbolize(vocab: DataFrame) -> DataFrame:
    """Initial symbol sequences of a (token, freq) vocab as a
    (repr, freq) frame (see :func:`symbolize_col`)."""
    return vocab.select(symbolize_col().alias("repr"), "freq")


def chain_merges(col, merges, passes: int = MERGE_PASSES):
    """Apply an ordered merge list to a repr column as chained literal
    space-bounded replaces — the ONE merge-application definition shared
    by apply_merge, bpe_train's per-round re-derivation and
    bpe_segment_counts (drift here would break the train/segment parity
    the oracle gate depends on)."""
    for left, right in merges:
        pat = F.lit(f" {left} {right} ")
        rep = F.lit(f" {left}{right} ")
        for _ in range(int(passes)):
            col = F.replace(col, pat, rep)
    return col


def pair_counts(reprs: DataFrame) -> DataFrame:
    """Adjacent-pair weighted counts: ``lhs, rhs, pair_count``.
    The explode is bounded by total symbol count of the VOCAB (not the
    corpus); the grouped sum partial-aggregates map-side."""
    syms = F.split(F.trim(F.col("repr")), " ")
    # guard single-symbol words: F.sequence(1, 0) DESCENDS in Spark, it
    # does not produce an empty list (explode then drops the empty array)
    idx = F.when(F.size(syms) > 1,
                 F.sequence(F.lit(1), F.size(syms) - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pair = F.explode(F.transform(
        idx,
        lambda i: F.struct(F.element_at(syms, i).alias("l"),
                           F.element_at(syms, i + 1).alias("r"))))
    return (reprs.select(pair.alias("p"), "freq")
            .select(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"),
                    "freq")
            .groupBy("lhs", "rhs")
            .agg(F.sum("freq").cast("long").alias("pair_count")))


def apply_merge(reprs: DataFrame, left: str, right: str,
                passes: int = MERGE_PASSES) -> DataFrame:
    """Merge pair (left, right) everywhere: ``passes`` applications of the
    literal space-bounded replace (see module docstring)."""
    col = chain_merges(F.col("repr"), [(left, right)], passes)
    return reprs.select(col.alias("repr"), "freq")


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    ``step, lhs, rhs, pair_count`` (step 1..n).

    Each round runs EXACTLY ONE action: the pair-count aggregate's
    driver-side top-1 (TakeOrdered).  The symbolized weighted vocab is
    cached once; round k's representation is the base column with the
    k-1 learned merges applied as CHAINED literal-replace expressions
    (map-only over the cached vocab — re-running k*MERGE_PASSES string
    replaces per round is far cheaper than the per-round
    cache+materialize job the naive loop pays, and the expression chain
    is bounded by 2*n_merges nested replaces).  Ties break by
    (lhs, rhs) ascending — binary collation in both engines."""
    spark = docs.sparkSession
    base = symbolize(weighted_vocab(docs, text_col)).cache()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, int(n_merges) + 1):
            col = chain_merges(
                F.col("repr"), [(l, r) for _s, l, r, _c in merges])
            cur = base.select(col.alias("repr"), "freq")
            top = (pair_counts(cur)
                   .orderBy(F.desc("pair_count"), "lhs", "rhs")
                   .limit(1).collect())
            if not top:
                break
            l, r, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
            merges.append((step, l, r, int(cnt)))
    finally:
        base.unpersist()
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, pair_count long")


def bpe_segment_counts(docs: DataFrame,
                       merges: list[tuple[str, str]],
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Re-segment the corpus with a learned merge list: per-document BPE
    subword count next to the whitespace token count — the token-budget
    currency a trained tokenizer actually charges.

    The merge list is applied IN ORDER to the distinct-token table (each
    merge = :func:`apply_merge`'s literal replace; K merges = K chained
    map expressions over vocab-sized data), then per-token subword counts
    broadcast-join back onto the exploded corpus — the same
    vocab-as-broadcast-LM shape as the unigram-surprisal query.  Driver
    state is the K-row merge list (collected by the caller from
    :func:`bpe_train`; tokenizer-sized, the documented planner-state
    convention)."""
    toks = (docs.select(F.col(id_col),
                        F.explode(tokens_col(F.col(text_col)))
                        .alias("token"))
            .filter(F.col("token") != ""))
    vocab = toks.select("token").distinct()
    seg = vocab.select("token", symbolize_col().alias("repr"))
    col = chain_merges(F.col("repr"), merges)
    lut = seg.select(
        "token",
        F.size(F.split(F.trim(col), " ")).cast("long").alias("n_sub"))
    return (toks.join(F.broadcast(lut), "token")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("n_sub").cast("long").alias("n_subwords")))
